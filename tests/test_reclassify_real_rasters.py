"""The reference's reclassify goldens on its REAL test rasters.

Reference tests/test_reclassify.py cases 2 and 3 reclassify the published
slope_in / aspect_in grids (84x68 real slope/aspect rasters, decoded from
the AIG coverages without GDAL — tests/aig_reader.py) and compare against
the published expect_r_2 / expect_r_3 grids. Here the ENGINE's vectorized
reclassify runs the same remaps and is asserted against the expected
coverages pixel-for-pixel: literal pixels exactly, nodata placement
EXACTLY (full array equality — the AIG reader decodes the 0xD7
literal/nodata-run tiles natively)."""

import os

import numpy as np
import pytest

from balrog_spark import kernels, reference_impl as ri

from tests.aig_reader import read_aig

_TD = "/root/reference/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_TD), reason="reference test_data not present")

# remaps exactly as published (reference tests/test_reclassify.py:73-100)
SLOPE_REMAP = ("0 0 1;0.0001 5 2;5.0001 10 3;10.0001 15 4;"
               "15.0001 20 5;20.0001 20 6")
ASPECT_REMAP = ("-1 0 9;0 22.5 1;22.5 67.5 2;67.5 112.5 3;"
                "112.5 157.5 4;157.5 202.5 5;202.5 247.5 6;"
                "247.5 292.5 7;292.5 337.5 8;337.5 360 1")


def test_slope_reclassify_matches_published_grid():
    slope_in = read_aig(f"{_TD}/input/slope_in")
    assert slope_in.shape == (68, 84)
    got = kernels.reclassify_vec(slope_in, SLOPE_REMAP)
    # engine kernel == loop-level reference restatement
    np.testing.assert_array_equal(
        got, ri.reclassify_array(slope_in, SLOPE_REMAP))
    np.testing.assert_array_equal(
        got, read_aig(f"{_TD}/reference/expect_r_2"))


def test_aspect_reclassify_matches_published_grid():
    aspect_in = read_aig(f"{_TD}/input/aspect_in")
    assert aspect_in.shape == (68, 84)
    got = kernels.reclassify_vec(aspect_in, ASPECT_REMAP)
    np.testing.assert_array_equal(
        got, ri.reclassify_array(aspect_in, ASPECT_REMAP))
    np.testing.assert_array_equal(
        got, read_aig(f"{_TD}/reference/expect_r_3"))


def test_scenario_inputs_match_embedded_rle():
    """The run-length rows embedded in test_scenario_strip.py are exactly
    the reference's veg/slope/aspect_samp coverages."""
    from tests import test_scenario_strip as sc
    veg = read_aig(f"{_TD}/input/veg_samp")
    slope = read_aig(f"{_TD}/input/slope_samp")
    asp = read_aig(f"{_TD}/input/aspect_samp")
    np.testing.assert_array_equal(sc._expand(sc.VEG), veg)
    np.testing.assert_array_equal(sc._expand(sc.SLOPE), slope)
    np.testing.assert_array_equal(sc._expand(sc.ASPECT), asp)


# the reference's reclassify case 1: real 132x166 vegetation raster
# (vege.img, declared nodata 0) with the published 38-range veg remap
VEG_REMAP_1 = ("1 3;2 2;3 3;4 5 7;6 8 1;9 2;10 3;11 12 1;13 1;14 3;"
               "15 6;16 7;17 3;18 19 2;20 7;21 3;22 2; 23 24 7;25 27 5;"
               "28 2;29 30 7;31 3;32 33 1;34 7;35 3;36 37 7;38 4;39 7;"
               "40 1;41 2;42 7;43 2;44 7;45 4;46 7;47 NODATA;97 2;"
               "98 99 1")


def test_veg_reclassify_matches_published_grid():
    from tests.hfa_reader import read_img
    veg = read_img(f"{_TD}/input/vege.img")
    # vege.img declares 0 as its nodata value (RasterToNumPyArray maps
    # declared nodata to -99 before the remap runs)
    veg = np.where((veg < -1e30) | (veg == 0.0), -99.0, veg)
    assert veg.shape == (132, 166)
    got = kernels.reclassify_vec(veg, VEG_REMAP_1)
    np.testing.assert_array_equal(
        got, ri.reclassify_array(veg, VEG_REMAP_1))
    np.testing.assert_array_equal(
        got, read_aig(f"{_TD}/reference/expect_r_1"))


def test_vegetation_reclassify_matches_published_grid():
    """The reference's FIRST reclassify golden (tests/test_reclassify.py
    case 1): the 38-rule vegetation remap over the real vege.img (132x166,
    nodata declared as 0) must equal expect_r_1 pixel-for-pixel."""
    from tests.hfa_reader import read_img
    veg = read_img(f"{_TD}/input/vege.img")
    veg = np.where((veg < -1e30) | (veg == 0.0), -99.0, veg)
    remap = ("1 3;2 2;3 3;4 5 7;6 8 1;9 2;10 3;11 12 1;13 1;14 3;"
             "15 6;16 7;17 3;18 19 2;20 7;21 3;22 2; 23 24 7;25 27 5;"
             "28 2;29 30 7;31 3;32 33 1;34 7;35 3;36 37 7;38 4;39 7;"
             "40 1;41 2;42 7;43 2;44 7;45 4;46 7;47 NODATA;97 2;98 99 1")
    got = kernels.reclassify_vec(veg, remap)
    np.testing.assert_array_equal(
        got, ri.reclassify_array(veg, remap))
    np.testing.assert_array_equal(got, read_aig(f"{_TD}/reference/expect_r_1"))
