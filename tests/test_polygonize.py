"""Raster -> vector polygonization: the two-stage plan (per-tile run
extraction + run-level rectangle coalescing) against an independent global
brute force, plus exact-cover properties and tile-split invariance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.types import (ArrayType, DoubleType, FloatType, IntegerType,
                               StringType, StructField, StructType)

from balrog_spark import raster

PX = 25.0

TILE_SCHEMA = StructType([
    StructField("media_ref", StringType(), False),
    StructField("layer", StringType(), False),
    StructField("tile_x", IntegerType(), False),
    StructField("tile_y", IntegerType(), False),
    StructField("x0", DoubleType(), False),
    StructField("y0", DoubleType(), False),
    StructField("pixel_m", DoubleType(), False),
    StructField("nrows", IntegerType(), False),
    StructField("ncols", IntegerType(), False),
    StructField("data", ArrayType(FloatType()), False)])


def _tiles_from_grid(spark, grid, tr, tc):
    """Split a global top-down grid into (tr x tc) tiles; tile_y counts from
    the south, data row 0 is each tile's northernmost row."""
    n, m = grid.shape
    assert n % tr == 0 and m % tc == 0
    n_ty, n_tx = n // tr, m // tc
    rows = []
    for gy in range(n_ty):          # gy = tile row from the NORTH
        for tx in range(n_tx):
            ty = n_ty - 1 - gy
            sub = grid[gy * tr:(gy + 1) * tr, tx * tc:(tx + 1) * tc]
            rows.append({
                "media_ref": f"veg/{tx}/{ty}", "layer": "veg",
                "tile_x": tx, "tile_y": ty,
                "x0": tx * tc * PX, "y0": ty * tr * PX, "pixel_m": PX,
                "nrows": tr, "ncols": tc,
                "data": sub.astype(np.float32).ravel().tolist()})
    return spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)


def _rects_bruteforce(grid):
    """Maximal horizontal runs, then vertical coalescing of identical runs —
    the same deterministic decomposition rule, written as plain loops on the
    global top-down grid. Returns {(v, r0, c0, r1, c1)}."""
    n, m = grid.shape
    runs = []                       # (r, v, c0, c1)
    for r in range(n):
        c = 0
        while c < m:
            c1 = c
            while c1 + 1 < m and grid[r, c1 + 1] == grid[r, c]:
                c1 += 1
            runs.append((r, int(grid[r, c]), c, c1))
            c = c1 + 1
    open_rects = {}                 # (v, c0, c1) -> [r0, r_last]
    rects = set()
    for r, v, c0, c1 in sorted(runs):
        key = (v, c0, c1)
        if key in open_rects and open_rects[key][1] == r - 1:
            open_rects[key][1] = r
        else:
            if key in open_rects:
                r0, r1 = open_rects.pop(key)
                rects.add((v, r0, c0, r1, c1))
            open_rects[key] = [r, r]
    for (v, c0, c1), (r0, r1) in open_rects.items():
        rects.add((v, r0, c0, r1, c1))
    return rects


def _engine_rects(spark, grid, tr, tc):
    n = grid.shape[0]
    tiles = _tiles_from_grid(spark, grid, tr, tc)
    out = raster.polygonize_rects(raster.polygonize_tiles(tiles)).collect()
    return {(int(r.class_val), n - 1 - int(r.grow1), int(r.gcol0),
             n - 1 - int(r.grow0), int(r.gcol1)) for r in out}, out


@pytest.fixture(scope="module")
def rng_grid():
    rng = np.random.RandomState(20260816)
    # blobby structure: coarse random blocks so runs cross tile borders
    coarse = rng.randint(1, 4, size=(8, 10))
    return np.kron(coarse, np.ones((5, 5), dtype=np.int64))[:40, :50] \
        + (rng.rand(40, 50) < 0.05)  # sparse salt so some runs are short


def test_polygonize_matches_global_bruteforce(spark, rng_grid):
    got, _ = _engine_rects(spark, rng_grid, tr=10, tc=25)
    assert got == _rects_bruteforce(rng_grid)


def test_polygonize_exact_cover(spark, rng_grid):
    _, rows = _engine_rects(spark, rng_grid, tr=10, tc=25)
    n, m = rng_grid.shape
    paint = np.full((n, m), -1, dtype=np.int64)
    total = 0
    for r in rows:
        r0, r1 = n - 1 - int(r.grow1), n - 1 - int(r.grow0)
        c0, c1 = int(r.gcol0), int(r.gcol1)
        assert (paint[r0:r1 + 1, c0:c1 + 1] == -1).all(), "overlap"
        paint[r0:r1 + 1, c0:c1 + 1] = r.class_val
        total += int(r.n_pixels)
        assert r.area_m2 == pytest.approx(r.n_pixels * PX * PX)
    assert total == n * m                     # no gaps
    assert (paint == rng_grid).all()          # classes painted back exactly


def test_polygonize_tile_split_invariant(spark, rng_grid):
    one, _ = _engine_rects(spark, rng_grid, tr=40, tc=50)   # single tile
    split, _ = _engine_rects(spark, rng_grid, tr=10, tc=25)  # 4x2 tiles
    fine, _ = _engine_rects(spark, rng_grid, tr=5, tc=10)    # 8x5 tiles
    assert one == split == fine


def _flood_labels(grid):
    """Independent 4-connected flood fill on the global grid: label per
    pixel (BFS, plain loops)."""
    n, m = grid.shape
    lab = np.full((n, m), -1, dtype=np.int64)
    nxt = 0
    for r in range(n):
        for c in range(m):
            if lab[r, c] != -1:
                continue
            stack = [(r, c)]
            lab[r, c] = nxt
            while stack:
                y, x = stack.pop()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if (0 <= yy < n and 0 <= xx < m and lab[yy, xx] == -1
                            and grid[yy, xx] == grid[y, x]):
                        lab[yy, xx] = nxt
                        stack.append((yy, xx))
            nxt += 1
    return lab


def test_components_match_flood_fill(spark, rng_grid):
    n = rng_grid.shape[0]
    tiles = _tiles_from_grid(spark, rng_grid, tr=10, tc=25)
    rects = raster.polygonize_rects(raster.polygonize_tiles(tiles))
    comp = raster.polygonize_components(rects)
    from pyspark.sql import functions as F
    rows = (rects.withColumn(
        "nid", F.col("grow0") * (1 << 21) + F.col("gcol0"))
        .join(comp.select("nid", "component"), "nid").collect())
    flood = _flood_labels(rng_grid)
    # engine component of each rect == flood label of its top-left pixel,
    # up to relabelling: the two partitions of the rect set must be equal
    eng, ref = {}, {}
    for r in rows:
        key = (int(r.grow0), int(r.gcol0))
        eng.setdefault(int(r.component), set()).add(key)
        fl = flood[n - 1 - int(r.grow1), int(r.gcol0)]
        ref.setdefault(int(fl), set()).add(key)
    assert sorted(map(sorted, eng.values())) == \
        sorted(map(sorted, ref.values()))
    # and every engine component is single-class (labels carry class_val)
    by_comp = {}
    for r in rows:
        by_comp.setdefault(int(r.component), set()).add(int(r.class_val))
    assert all(len(vs) == 1 for vs in by_comp.values())


def test_polygonize_wkt_areas(spark, rng_grid):
    from balrog_spark import geometry
    tiles = _tiles_from_grid(spark, rng_grid, tr=10, tc=25)
    rects = raster.polygonize_wkt(
        raster.polygonize_rects(raster.polygonize_tiles(tiles)))
    rows = rects.collect()
    per_class = {}
    for r in rows:
        polys = geometry.parse_wkt_polys(r.wkt)
        assert len(polys) == 1
        a = geometry.polygon_area(polys[0])
        assert a == pytest.approx(float(r.n_pixels) * PX * PX)
        per_class.setdefault(int(r.class_val), []).append(polys[0])
    # rectangles of one class union to exactly the class's pixel area
    # (disjointness + exact cover, measured through the vector core)
    counts = {int(v): int((rng_grid == v).sum())
              for v in np.unique(rng_grid)}
    for v, polys in per_class.items():
        assert geometry.union_area(polys) == \
            pytest.approx(counts[v] * PX * PX)


def test_polygonize_feeds_pip_join(spark, rng_grid):
    """Cross-plane E2E: raster -> polygonize -> WKT -> PIP join. For random
    interior points, the joined class must equal the class of the pixel the
    point sits on (direct array lookup) — the raster plane and the vector
    join plane agree end to end."""
    from pyspark.sql import functions as F

    from balrog_spark import joins

    n, m = rng_grid.shape
    tiles = _tiles_from_grid(spark, rng_grid, tr=10, tc=25)
    polys = raster.polygonize_wkt(
        raster.polygonize_rects(raster.polygonize_tiles(tiles))) \
        .select(F.format_string("%06d", F.monotonically_increasing_id())
                .alias("veg_id"),
                F.col("class_val").cast("long").alias("bal_number"), "wkt")

    rng = np.random.RandomState(7)
    px_r = rng.randint(0, n, size=200)
    px_c = rng.randint(0, m, size=200)
    # strictly interior offsets so no point sits on a rect boundary
    xs = (px_c + 0.25 + 0.5 * rng.rand(200)) * PX
    ys = ((n - 1 - px_r) + 0.25 + 0.5 * rng.rand(200)) * PX
    pts = spark.createDataFrame(
        pd.DataFrame({"addr_id": [f"{i:05d}" for i in range(200)],
                      "x": xs, "y": ys}))

    got = {r.addr_id: int(r.bal_number)
           for r in joins.pip_join(pts, polys, cell_m=200.0).collect()}
    assert len(got) == 200                    # exact cover: every point hits
    for i in range(200):
        assert got[f"{i:05d}"] == int(rng_grid[px_r[i], px_c[i]])


def test_component_node_ids_do_not_collide_on_wide_grids(spark):
    """The old 21-bit (grow0, gcol0) packing collided for grids wider
    than 2^21 columns — (0, 2^21+5) and (1, 5) mapped to one node id,
    silently fusing unrelated components. The widened rect_nid keeps
    them distinct."""
    import pandas as pd

    rects = spark.createDataFrame(pd.DataFrame({
        "class_val": [1.0, 1.0],
        "grow0": [0, 1], "grow1": [0, 1],
        "gcol0": [(1 << 21) + 5, 5], "gcol1": [(1 << 21) + 6, 6]}))
    comp = raster.polygonize_components(rects).toPandas()
    assert comp.nid.nunique() == 2
    assert comp.component.nunique() == 2
