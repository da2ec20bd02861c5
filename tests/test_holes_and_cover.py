"""Interior-ring (hole) geometry + non-broadcast cover join paths.

Holes: real NVIS vegetation polygons are holed (reference:
data_prep/vegetation/03_explode_multipolygons_and_classify.sql:5-9); a point
inside a hole must NOT PIP-match and distances must measure to hole rings.

Cover strategy: pip/dwithin/knn must produce identical results with the cover
broadcast (small layers) and shuffle-joined (9.4M-polygon scale path, with
the PIP cover cell-clipped so per-cell bytes stay bounded).
"""

import numpy as np
import pandas as pd
import pytest

from balrog_spark import geometry, joins


def _holed_wkt(cx, cy, hw, hh, hx, hy):
    ext = [(cx - hw, cy - hh), (cx + hw, cy - hh), (cx + hw, cy + hh),
           (cx - hw, cy + hh), (cx - hw, cy - hh)]
    hole = [(cx - hx, cy - hy), (cx + hx, cy - hy), (cx + hx, cy + hy),
            (cx - hx, cy + hy), (cx - hx, cy - hy)]
    def ring(r):
        return "(" + ", ".join(f"{x} {y}" for x, y in r) + ")"
    return f"POLYGON ({ring(ext)}, {ring(hole)})"


def test_parse_wkt_polys_keeps_holes():
    w = _holed_wkt(0, 0, 10, 10, 4, 4)
    polys = geometry.parse_wkt_polys(w)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert geometry.polygon_area(polys[0]) == pytest.approx(400 - 64)
    # exterior-only compat view
    assert len(geometry.parse_wkt(w)) == 1


def test_multipolygon_with_holes_roundtrip():
    polys = [
        [np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.]]),
         np.array([[2., 2.], [4., 2.], [4., 4.], [2., 4.]])],
        [np.array([[20., 0.], [30., 0.], [30., 10.], [20., 10.]])],
    ]
    w = geometry.multipolygon_wkt_polys(polys)
    back = geometry.parse_wkt_polys(w)
    assert len(back) == 2
    assert len(back[0]) == 2 and len(back[1]) == 1
    assert geometry.polygon_area(back[0]) == pytest.approx(96)


def test_points_in_polygon_even_odd():
    poly = geometry.parse_wkt_polys(_holed_wkt(0, 0, 10, 10, 4, 4))[0]
    px = np.array([0.0, 6.0, 11.0, 3.9, 4.1])
    py = np.array([0.0, 0.0, 0.0, 0.0, 0.0])
    got = geometry.points_in_polygon(px, py, poly)
    # centre is inside the hole -> outside; 6 is between rings -> inside
    assert got.tolist() == [False, True, False, False, True]


def test_polygon_distance_counts_hole_rings():
    poly = geometry.parse_wkt_polys(_holed_wkt(0, 0, 10, 10, 4, 4))[0]
    px = np.array([0.0, 6.0, 13.0])
    py = np.array([0.0, 0.0, 0.0])
    d, nx, ny = geometry.points_to_polygon_distance(px, py, poly)
    # centre: nearest boundary is the hole ring at 4
    assert d[0] == pytest.approx(4.0)
    # between rings: min(dist-to-hole=2, dist-to-ext=4) = 2
    assert d[1] == pytest.approx(2.0)
    assert d[2] == pytest.approx(3.0)


def _rng_points(n, lo, hi, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=(n, 2))


def test_holed_pip_dwithin_bruteforce_spark(spark):
    rng = np.random.default_rng(7)
    polys = []
    for i in range(6):
        cx, cy = rng.uniform(100, 900, 2)
        hw, hh = rng.uniform(40, 120, 2)
        hx, hy = hw * 0.5, hh * 0.5
        polys.append({"veg_id": f"{i:03d}", "bal_number": i + 1,
                      "wkt": _holed_wkt(cx, cy, hw, hh, hx, hy),
                      "geom": [cx, cy, hw, hh, hx, hy]})
    pts = _rng_points(400, 0, 1000, 11)
    pdf_pts = pd.DataFrame({"addr_id": [f"{i:04d}" for i in range(len(pts))],
                            "x": pts[:, 0], "y": pts[:, 1]})
    sp = spark.createDataFrame(pdf_pts)
    sv = spark.createDataFrame(
        pd.DataFrame([{k: p[k] for k in ("veg_id", "bal_number", "wkt")}
                      for p in polys]))

    def brute(radius=None):
        exp = set()
        for p in polys:
            cx, cy, hw, hh, hx, hy = p["geom"]
            dx = np.abs(pts[:, 0] - cx)
            dy = np.abs(pts[:, 1] - cy)
            in_ext = (dx < hw) & (dy < hh)
            in_hole = (dx < hx) & (dy < hy)
            inside = in_ext & ~in_hole
            if radius is None:
                for aid in pdf_pts.addr_id.values[inside]:
                    exp.add((aid, p["veg_id"]))
            else:
                d_out = np.hypot(np.maximum(dx - hw, 0),
                                 np.maximum(dy - hh, 0))
                d_hole = np.minimum(hx - dx, hy - dy)
                d = np.where(inside, 0.0, np.where(in_hole, d_hole, d_out))
                for aid in pdf_pts.addr_id.values[d <= radius]:
                    exp.add((aid, p["veg_id"]))
        return exp

    for bc in (True, False):
        got = joins.pip_join(sp, sv, broadcast_cover=bc).toPandas()
        assert set(zip(got.addr_id, got.veg_id)) == brute(), f"bc={bc}"
        got = joins.dwithin_join(sp, sv, 80.0, broadcast_cover=bc).toPandas()
        assert set(zip(got.addr_id, got.veg_id)) == brute(80.0), f"bc={bc}"


def test_knn_broadcast_vs_shuffle_identical(spark):
    rng = np.random.default_rng(3)
    polys = []
    for i in range(5):
        cx, cy = rng.uniform(200, 1800, 2)
        hw, hh = rng.uniform(30, 90, 2)
        polys.append({"veg_id": f"{i:03d}", "bal_number": i + 1,
                      "wkt": _holed_wkt(cx, cy, hw, hh, hw / 2, hh / 2)})
    pts = _rng_points(120, 0, 2000, 5)
    sp = spark.createDataFrame(
        pd.DataFrame({"addr_id": [f"{i:04d}" for i in range(len(pts))],
                      "x": pts[:, 0], "y": pts[:, 1]}))
    sv = spark.createDataFrame(pd.DataFrame(polys))
    a = joins.knn_join(sp, sv, broadcast_cover=True).toPandas() \
        .sort_values("addr_id").reset_index(drop=True)
    b = joins.knn_join(sp, sv, broadcast_cover=False).toPandas() \
        .sort_values("addr_id").reset_index(drop=True)
    assert len(a) == len(pts)
    pd.testing.assert_frame_equal(a, b)


def test_clipped_cover_pip_matches_full_cover(spark):
    """The cell-clipped (scale-path) cover must agree with the full-WKT
    broadcast cover on a polygon that spans many cells."""
    big = _holed_wkt(500, 500, 450, 450, 200, 200)  # spans 3x3 cells at 400m
    sv = spark.createDataFrame(
        pd.DataFrame([{"veg_id": "big", "bal_number": 1, "wkt": big}]))
    pts = _rng_points(500, 0, 1000, 17)
    sp = spark.createDataFrame(
        pd.DataFrame({"addr_id": [f"{i:04d}" for i in range(len(pts))],
                      "x": pts[:, 0], "y": pts[:, 1]}))
    a = joins.pip_join(sp, sv, broadcast_cover=True).toPandas()
    b = joins.pip_join(sp, sv, broadcast_cover=False).toPandas()
    assert set(a.addr_id) == set(b.addr_id)
    dx = np.abs(pts[:, 0] - 500)
    dy = np.abs(pts[:, 1] - 500)
    exp = ((dx < 450) & (dy < 450)) & ~((dx < 200) & (dy < 200))
    assert set(a.addr_id) == {f"{i:04d}" for i in np.nonzero(exp)[0]}
