"""The reference's whole-pipeline goldens on its REAL rasters, end to end.

With the AIG coverages (tests/aig_reader.py) and the ERDAS .img fixtures
(tests/hfa_reader.py) both decodable without GDAL/arcpy, the reference's
own heavyweight tests port directly:

- test_bal_cal: classified veg_c/slope_c/aspect_c (67x56 real rasters,
  fdi=80) -> bal_max must equal the published expect_bal_max.img
  PIXEL-EXACTLY — the reference's strongest full-pipeline golden;
- test_cal_slope_aspect: dem.img (real 84x68 terrain, 482-538 m) ->
  slope/aspect must match the published expect_s / expect_a coverages
  (float32 storage precision).
Both run through the ENGINE kernels and, for BAL, through the tiled
border-strip plan as well."""

import os

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from balrog_spark import kernels, raster

from tests.aig_reader import read_aig
from tests.hfa_reader import read_img

_TD = "/root/reference/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_TD), reason="reference test_data not present")

PIXEL_M = 25.0
FDI = 80


def _load_classified():
    veg = read_aig(f"{_TD}/input/veg_c")
    slope = read_aig(f"{_TD}/input/slope_c")
    asp = read_aig(f"{_TD}/input/aspect_c")
    return veg, slope, asp


def _expected_bal_max():
    bm = read_img(f"{_TD}/reference/expect_bal_max.img")
    return np.where(bm < -1e30, -99.0, bm)


def test_bal_cal_real_rasters_global_kernel():
    veg, slope, asp = _load_classified()
    assert veg.shape == (67, 56)
    outs = kernels.bal_all_directions(veg, slope, asp, PIXEL_M, FDI)
    assert_array_equal(outs["max"], _expected_bal_max())


def test_bal_cal_real_rasters_through_tiles(spark):
    """The same golden through the production border-strip tiled plan,
    split across tiles in both axes (56 = 2x28 cols; rows 34+33)."""
    import pandas as pd
    veg, slope, asp = _load_classified()
    rows = []
    row_bands = [(0, 34), (34, 67)]
    for tx in range(2):
        csl = slice(tx * 28, (tx + 1) * 28)
        for ty, (r0, r1) in enumerate(row_bands):
            for lay, arr in (("veg_r", veg), ("slope_r", slope),
                             ("aspect_r", asp)):
                # larger tile_y = further north = smaller row index
                band = arr[r0:r1, csl]
                rows.append({
                    "media_ref": f"{lay}/{tx}/{1 - ty}", "layer": lay,
                    "tile_x": tx, "tile_y": 1 - ty,
                    "x0": tx * 28 * PIXEL_M,
                    "y0": (67 - r1) * PIXEL_M,
                    "pixel_m": PIXEL_M,
                    "nrows": r1 - r0, "ncols": 28,
                    "data": band.astype(np.float32).ravel().tolist()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = raster.bal_tiles_classified(tiles, FDI).toPandas()
    got = np.full((67, 56), np.nan)
    for r in out.itertuples():
        band = row_bands[1 - r.tile_y]
        got[band[0]:band[1], r.tile_x * 28:(r.tile_x + 1) * 28] = \
            np.asarray(r.bal_max, dtype=np.float64).reshape(r.nrows, 28)
    assert not np.isnan(got).any()
    assert_array_equal(got, _expected_bal_max())


def test_dem_slope_aspect_matches_published_coverages():
    dem = read_img(f"{_TD}/input/dem.img")
    dem = np.where(dem < -1e30, -99.0, dem)
    assert dem.shape == (68, 84)
    v = dem[dem != -99]
    assert 480 < v.min() < v.max() < 540  # real terrain, metres
    exp_s = read_aig(f"{_TD}/reference/expect_s")
    exp_a = read_aig(f"{_TD}/reference/expect_a")
    slope, aspect = kernels.cal_slope_aspect_vec(dem, PIXEL_M, PIXEL_M)
    assert ((slope == -99) == (exp_s == -99)).all()
    ms = exp_s != -99
    assert np.abs(slope[ms] - exp_s[ms]).max() < 1e-5
    ma = exp_a != -99
    d = np.abs(aspect[ma] - exp_a[ma])
    assert np.minimum(d, 360.0 - d).max() < 1e-4  # float32 storage


def _vege_mga():
    from tests.hfa_reader import read_mapinfo
    vm = read_img(f"{_TD}/input/vege_mga.img")
    # vege_mga declares 0 as its nodata value
    vm = np.where((vm < -1e30) | (vm == 0.0), -99.0, vm)
    return vm, read_mapinfo(f"{_TD}/input/vege_mga.img")


@pytest.mark.parametrize("name", ["small", "large"])
def test_extract_by_mask_matches_published_img(name):
    """The reference's test_extract_by_mask golden, EXACT: vege_mga.img
    masked by the published mask shapefiles equals
    expect_extracted_{small,large}.img pixel-for-pixel. The expected
    grids are snapped to the mask origin (a sub-pixel shift from the
    source grid), so the comparison evaluates the engine's
    pixel-centre-in-polygon rule at the EXPECTED grid's centres with
    nearest-neighbour source lookup — which reproduces arcpy's
    ExtractByMask exactly on these fixtures."""
    from balrog_spark import geometry
    from balrog_spark.shapefile import read_shp_records
    from tests.hfa_reader import read_mapinfo
    vm, (ulx0, uly0, px) = _vege_mga()
    poly = geometry.parse_wkt_polys(
        read_shp_records(f"{_TD}/input/mask_extent_{name}.shp")[0][2])[0]
    exp = read_img(f"{_TD}/reference/expect_extracted_{name}.img")
    exp = np.where((exp < -1e30) | (exp == -128), -99.0, exp)
    ulxe, ulye, pxe = read_mapinfo(
        f"{_TD}/reference/expect_extracted_{name}.img")
    eh, ew = exp.shape
    X, Y = np.meshgrid(ulxe + np.arange(ew) * pxe,
                       ulye - np.arange(eh) * pxe)
    ci = np.round((X - ulx0) / px).astype(int)
    ri = np.round((uly0 - Y) / px).astype(int)
    ok = (ri >= 0) & (ri < vm.shape[0]) & (ci >= 0) & (ci < vm.shape[1])
    src = np.full(exp.shape, -99.0)
    src[ok] = vm[ri[ok], ci[ok]]
    inside = geometry.points_in_geom(X.ravel(), Y.ravel(),
                                     [poly]).reshape(exp.shape)
    got = np.where(inside, src, -99.0)
    assert_array_equal(got, exp)


def test_extract_by_mask_tiles_engine_path(spark):
    """The engine's tiled extract (raster.extract_by_mask_tiles) applies
    the same pixel-centre rule on the source grid: masked output equals a
    direct numpy mask of vege_mga with the real small-mask polygon."""
    import pandas as pd
    from balrog_spark import geometry
    from balrog_spark.shapefile import read_shp_records
    vm, (ulx0, uly0, px) = _vege_mga()
    h, w = vm.shape
    wkt = read_shp_records(f"{_TD}/input/mask_extent_small.shp")[0][2]
    tiles = spark.createDataFrame(pd.DataFrame([{
        "media_ref": "veg/0/0", "layer": "veg", "tile_x": 0, "tile_y": 0,
        "x0": ulx0 - px / 2, "y0": uly0 + px / 2 - h * px,
        "pixel_m": px, "nrows": h, "ncols": w,
        "data": vm.astype(np.float32).ravel().tolist()}]))
    out = raster.extract_by_mask_tiles(tiles, wkt).collect()
    assert len(out) == 1
    got = np.asarray(out[0].data, dtype=np.float64).reshape(h, w)
    poly = geometry.parse_wkt_polys(wkt)[0]
    X, Y = np.meshgrid(ulx0 + np.arange(w) * px,
                       uly0 - np.arange(h) * px)
    inside = geometry.points_in_geom(X.ravel(), Y.ravel(),
                                     [poly]).reshape(h, w)
    exp = np.where(inside, vm, -99.0)
    assert_array_equal(got, exp)
