"""True geometric dissolve: exact union area of overlapping polygons.

The slab-sweep kernel (geometry.union_area) is checked against closed-form
cases, an independent rectangle scanline, and a fine rasterization; the
Spark partial/final plan (vector.dissolve_union) must decompose exactly
across grid cells and beat the naive sum wherever inputs overlap."""

import numpy as np
import pandas as pd
import pytest

from balrog_spark import geometry, vector


def _box(x1, y1, x2, y2):
    return [np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]],
                     dtype=float)]


def _box_wkt(x1, y1, x2, y2):
    return (f"POLYGON (({x1} {y1}, {x2} {y1}, {x2} {y2}, {x1} {y2}, "
            f"{x1} {y1}))")


def test_union_area_closed_forms():
    assert geometry.union_area([_box(0, 0, 10, 10),
                                _box(5, 0, 15, 10)]) == pytest.approx(150)
    assert geometry.union_area([_box(0, 0, 10, 10),
                                _box(20, 0, 30, 10)]) == pytest.approx(200)
    assert geometry.union_area([_box(0, 0, 10, 10),
                                _box(2, 2, 4, 4)]) == pytest.approx(100)


def test_union_area_holes_and_triangles():
    holed = [np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.]]),
             np.array([[3., 3.], [7., 3.], [7., 7.], [3., 7.]])]
    assert geometry.union_area([holed]) == pytest.approx(84)
    # a box covering the hole restores the full square
    assert geometry.union_area([holed, _box(2, 2, 8, 8)]) \
        == pytest.approx(100)
    # crossing triangles (non-axis-aligned edges + true segment crossings)
    t1 = [np.array([[0., 0.], [10., 0.], [5., 10.]])]
    t2 = [np.array([[0., 10.], [10., 10.], [5., 0.]])]
    assert geometry.union_area([t1, t2]) == pytest.approx(75.0)


def test_union_area_random_boxes_vs_scanline():
    rng = np.random.default_rng(0)
    boxes = [(a, b, a + c, b + d)
             for a, b, c, d in rng.uniform(1, 8, (20, 4))]
    got = geometry.union_area([_box(*b) for b in boxes])
    xs = sorted({v for b in boxes for v in (b[0], b[2])})
    exp = 0.0
    for i in range(len(xs) - 1):
        xm = (xs[i] + xs[i + 1]) / 2
        ivs = sorted((b[1], b[3]) for b in boxes if b[0] < xm < b[2])
        length, lo, hi = 0.0, None, None
        for a, b2 in ivs:
            if hi is None or a > hi:
                if hi is not None:
                    length += hi - lo
                lo, hi = a, b2
            else:
                hi = max(hi, b2)
        if hi is not None:
            length += hi - lo
        exp += (xs[i + 1] - xs[i]) * length
    assert got == pytest.approx(exp, abs=1e-9)


def test_union_area_random_polygons_vs_raster():
    rng = np.random.default_rng(42)
    polys = []
    for _ in range(8):
        cx, cy = rng.uniform(20, 80, 2)
        r = rng.uniform(5, 15)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
        ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                        axis=1)
        polys.append([ring])
    got = geometry.union_area(polys)
    n = 1200
    xs = np.linspace(0, 100, n, endpoint=False) + 50 / n
    X, Y = np.meshgrid(xs, xs)
    inside = np.zeros(X.size, dtype=bool)
    for p in polys:
        inside |= geometry.points_in_ring(X.ravel(), Y.ravel(), p[0])
    est = inside.mean() * 100 * 100
    assert got == pytest.approx(est, rel=0.01)


def test_dissolve_union_spark_decomposes_across_cells(spark):
    # overlapping pair straddling a 1600 m cell boundary + a disjoint box
    rows = [
        {"veg_id": "a", "bal_number": 1,
         "wkt": _box_wkt(1500, 100, 1700, 300)},
        {"veg_id": "b", "bal_number": 1,
         "wkt": _box_wkt(1600 - 50, 150, 1600 + 150, 350)},
        {"veg_id": "c", "bal_number": 2,
         "wkt": _box_wkt(0, 0, 100, 100)},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = vector.dissolve_union(df).toPandas().set_index("bal_number")
    exp_union = geometry.union_area(
        [_box(1500, 100, 1700, 300), _box(1550, 150, 1750, 350)])
    assert got.loc[1, "union_area_m2"] == pytest.approx(exp_union)
    assert got.loc[1, "naive_area_m2"] == pytest.approx(2 * 200 * 200)
    assert got.loc[1, "union_area_m2"] < got.loc[1, "naive_area_m2"]
    assert got.loc[2, "union_area_m2"] == pytest.approx(100 * 100)
    assert int(got.loc[1, "n_src"]) == 2
