"""The reference's whole-pipeline scenario golden, through the tiled engine.

Reference tests/test_scenario.py:40-77 runs bal_cal over a 3x140 strip of
CLASSIFIED veg/slope/aspect rasters at fdi=80 and asserts the westerly BAL
banding pixel-exactly. The classified inputs below are the reference's own
test_data grids (decoded from its ESRI AIG tiles and stored run-length; all
three rows of each layer are identical). The engine must reproduce the
banding BOTH globally (kernel) and split across tiles through
raster.bal_tiles_classified (border-strip halo plan)."""

import numpy as np
import pandas as pd
import pytest
from numpy.testing import assert_array_equal

from balrog_spark import kernels, raster

# run-length rows of the reference's veg_samp / slope_samp / aspect_samp
VEG = [(20, 1), (8, 2), (12, 3), (12, 4), (12, 5), (16, 6), (8, 7),
       (8, 1), (8, 2), (16, 3), (16, 4), (4, 5)]
SLOPE = [(20, 1), (8, 2), (12, 1), (12, 3), (12, 1), (16, 3), (8, 1),
         (8, 4), (8, 5), (16, 1), (16, 6), (4, 1)]
ASPECT = [(40, 7), (12, 3), (12, 5), (40, 7), (16, 4), (20, 7)]

PIXEL_M = 25.0
FDI = 80
NROWS, NCOLS = 3, 140


def _expand(runs):
    row = np.concatenate([np.full(n, v, dtype=np.float64)
                          for n, v in runs])
    assert len(row) == NCOLS
    return np.tile(row, (NROWS, 1))


def _bal_expect():
    """The reference's published expected banding
    (tests/test_scenario.py:42-52)."""
    e = np.ones([NROWS, NCOLS])
    e[:, 0] = -99
    e[:, 1:29] = 100
    e[:, 29:41] = 29
    e[:, 41:53] = 40
    e[:, 53:65] = 19
    e[:, 65:81] = 40
    e[:, 81:89] = 19
    e[:, 89:105] = 100
    e[:, 105:121] = 29
    e[:, 121:140] = 200
    return e


def test_scenario_strip_global_kernel():
    veg, slope, asp = _expand(VEG), _expand(SLOPE), _expand(ASPECT)
    outs = kernels.bal_all_directions(veg, slope, asp, PIXEL_M, FDI)
    assert_array_equal(outs["w"], _bal_expect())


@pytest.mark.parametrize("tile_cols", [35, 20])
def test_scenario_strip_through_tiles(spark, tile_cols):
    veg, slope, asp = _expand(VEG), _expand(SLOPE), _expand(ASPECT)
    rows = []
    for tx in range(NCOLS // tile_cols):
        sl = slice(tx * tile_cols, (tx + 1) * tile_cols)
        for lay, arr in (("veg_r", veg), ("slope_r", slope),
                         ("aspect_r", asp)):
            rows.append({
                "media_ref": f"{lay}/{tx}/0", "layer": lay,
                "tile_x": tx, "tile_y": 0,
                "x0": tx * tile_cols * PIXEL_M, "y0": 0.0,
                "pixel_m": PIXEL_M, "nrows": NROWS, "ncols": tile_cols,
                "data": arr[:, sl].astype(np.float32).ravel().tolist()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = raster.bal_tiles_classified(tiles, FDI).toPandas() \
        .sort_values("tile_x")
    got = np.hstack([
        np.asarray(r.bal_w, dtype=np.float64).reshape(NROWS, tile_cols)
        for r in out.itertuples()])
    assert_array_equal(got, _bal_expect())
    # the 8-direction max through tiles equals the global kernel's max
    outs = kernels.bal_all_directions(veg, slope, asp, PIXEL_M, FDI)
    got_max = np.hstack([
        np.asarray(r.bal_max, dtype=np.float64).reshape(NROWS, tile_cols)
        for r in out.itertuples()])
    assert_array_equal(got_max, outs["max"])
