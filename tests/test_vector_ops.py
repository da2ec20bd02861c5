"""Vector operator module (buffer/explode/validity/subdivide/dissolve)."""

import numpy as np
from numpy.testing import assert_allclose

from balrog_spark import geometry, vector


def _polys_df(spark):
    rows = [
        {"veg_id": "a", "bal_number": 1,
         "wkt": "MULTIPOLYGON (((0 0, 100 0, 100 100, 0 100, 0 0)), "
                "((500 500, 600 500, 600 600, 500 600, 500 500)))"},
        {"veg_id": "b", "bal_number": 1,
         "wkt": "POLYGON ((1000 1000, 1200 1000, 1200 1150, 1000 1150, "
                "1000 1000))"},
        {"veg_id": "c", "bal_number": 2,
         "wkt": "POLYGON ((300 300, 340 300, 340 340, 300 340, 300 300))"},
        {"veg_id": "d", "bal_number": 3,
         "wkt": "POLYGON ((50 50, 50 50, 50 50, 50 50))"},  # degenerate
    ]
    return spark.createDataFrame(rows)


def test_explode_multipolygon(spark):
    out = vector.explode_multipolygon(_polys_df(spark)).toPandas()
    a = out[out.veg_id == "a"]
    assert len(a) == 2
    assert sorted(a.area_m2) == [10000.0, 10000.0]
    assert len(out[out.veg_id == "b"]) == 1


def test_validity_flags(spark):
    out = vector.validity_flags(_polys_df(spark)).toPandas() \
        .set_index("veg_id").is_valid.to_dict()
    assert out == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_buffer_points(spark):
    pts = spark.createDataFrame(
        [{"addr_id": "p1", "x": 100.0, "y": 200.0}])
    out = vector.buffer_points(pts, 50.0, quad_segs=8).collect()
    ring = geometry.parse_wkt(out[0].wkt)[0]
    assert len(ring) == 33  # 32 vertices + closure
    d = np.hypot(ring[:, 0] - 100.0, ring[:, 1] - 200.0)
    assert_allclose(d, 50.0, rtol=1e-6)


def test_subdivide_preserves_area(spark):
    out = vector.subdivide(_polys_df(spark).filter("veg_id = 'b'"),
                           cell_m=100.0).toPandas()
    # 200 x 150 rect split on a 100 m grid -> 2x2 cells
    assert len(out) == 4
    assert_allclose(out.piece_area.sum(), 200.0 * 150.0)


def test_dissolve_partial_final(spark):
    out = vector.dissolve(_polys_df(spark).filter("veg_id != 'd'"),
                          cell_m=400.0).toPandas() \
        .set_index("bal_number")
    assert out.loc[1, "n_parts"] == 3
    assert_allclose(out.loc[1, "area_m2"], 10000 + 10000 + 200 * 150)
    assert out.loc[2, "n_parts"] == 1
    assert_allclose(out.loc[2, "area_m2"], 1600.0)
    # reassembled multipolygon parses back to the same total area
    rings = geometry.parse_wkt(out.loc[1, "wkt"])
    assert len(rings) == 3
    assert_allclose(sum(geometry.ring_area(r) for r in rings),
                    out.loc[1, "area_m2"])


def test_extract_by_mask_and_regrid(spark):
    import numpy as np
    from numpy.testing import assert_allclose
    from balrog_spark import corpus, raster

    tiles = corpus.spark_tiles(spark, 1, 1).filter("layer = 'dem'")
    # mask: a box covering the tile's south-west quarter
    mask = "POLYGON ((0 0, 800.25 0, 800.25 800.25, 0 800.25, 0 0))"
    out = raster.extract_by_mask_tiles(tiles, mask).collect()
    assert len(out) == 1
    n = corpus.TILE_N
    arr = np.asarray(out[0].data, dtype=np.float64).reshape(n, n)
    dem, _ = corpus.tile_arrays(0, 0)
    # pixel centres with x < 800.25 and y < 800.25: cols 0..31, rows 32..63
    exp = np.full((n, n), -99.0)
    exp[32:, :32] = dem[32:, :32]
    assert_allclose(arr, exp)

    rg = raster.regrid_tiles(tiles, factor=2).collect()[0]
    assert rg.nrows == n // 2 and rg.pixel_m == 50.0
    coarse = np.asarray(rg.data, dtype=np.float64).reshape(n // 2, n // 2)
    blocks = dem.reshape(n // 2, 2, n // 2, 2).transpose(0, 2, 1, 3) \
        .reshape(n // 2, n // 2, 4)
    valid = blocks != -99.0
    cnt = valid.sum(2)
    exp2 = np.where(cnt > 0,
                    np.where(valid, blocks, 0).sum(2) / np.maximum(cnt, 1),
                    -99.0)
    assert_allclose(coarse, exp2)
