"""Tier-1 golden + property tests: reference_impl vs published goldens, then
vectorized kernels vs reference_impl (no Spark involved)."""

import numpy as np
import pytest
from numpy.testing import assert_array_equal, assert_allclose

from balrog_spark import constants, kernels, reference_impl as ref
from tests import golden_convo as G


# --- goldens anchor reference_impl ------------------------------------------

def test_bal_esti_golden_sweep():
    result = []
    for fdi in G.BAL_ESTI_FDI:
        for slope in G.BAL_ESTI_SLOPE:
            for veg in G.BAL_ESTI_VEG:
                for dist in G.BAL_ESTI_DIST:
                    result.append(ref.bal_esti(veg, dist, slope, fdi))
    assert result == G.BAL_ESTI_EXPECTED


def test_convo_golden_all_directions():
    for d in constants.DIRECTIONS:
        out = ref.convo(d, G.VEG, G.SLOPE, G.aspect_for(d), G.PIXEL_WIDTH,
                        G.FDI)
        assert_array_equal(out, G.BAL_EXPECTED[d], err_msg=f"direction {d}")


# --- vectorized kernels vs reference_impl -----------------------------------

def _random_classified(rng, shape):
    veg = rng.choice([-99, 1, 2, 3, 4, 5, 6, 7], size=shape).astype(float)
    slope = rng.choice([-99, 1, 2, 3, 4, 5, 6], size=shape).astype(float)
    aspect = rng.choice([1, 2, 3, 4, 5, 6, 7, 8, 9, -99],
                        size=shape).astype(float)
    return veg, slope, aspect


def test_bal_esti_vec_exhaustive():
    vegs, dists, slopes = np.meshgrid(
        np.array([-99, 1, 2, 3, 4, 5, 6, 7], dtype=float),
        np.array([2.5, 12.5, 37.5, 49.9, 50.0, 62.5, 87.5, 120.0]),
        np.array([-99, -1, 1, 2, 3, 4, 5, 6], dtype=float), indexing="ij")
    for fdi in (100, 80, 50, 40):
        got = kernels.bal_esti_vec(vegs, dists, slopes, fdi)
        exp = np.vectorize(lambda v, d, s: ref.bal_esti(v, d, s, fdi))(
            vegs, dists, slopes)
        assert_array_equal(got, exp)


def test_convo_vec_matches_golden():
    for d in constants.DIRECTIONS:
        out = kernels.convo_vec(d, G.VEG, G.SLOPE, G.aspect_for(d),
                                G.PIXEL_WIDTH, G.FDI)
        assert_array_equal(out, G.BAL_EXPECTED[d], err_msg=f"direction {d}")


@pytest.mark.parametrize("shape", [(8, 8), (5, 13), (17, 6), (1, 9), (9, 1)])
@pytest.mark.parametrize("fdi", [100, 80, 50, 40])
def test_convo_vec_random(shape, fdi):
    rng = np.random.default_rng(42 + shape[0] * 100 + shape[1] + fdi)
    veg, slope, aspect = _random_classified(rng, shape)
    for d in constants.DIRECTIONS:
        got = kernels.convo_vec(d, veg, slope, aspect, 25.0, fdi)
        exp = ref.convo(d, veg, slope, aspect, 25.0, fdi)
        assert_array_equal(got, exp, err_msg=f"dir={d} shape={shape}")


def test_bal_all_directions_max_matches_reference():
    outs = kernels.bal_all_directions(G.VEG, G.SLOPE,
                                      {d: G.aspect_for(d)
                                       for d in constants.DIRECTIONS},
                                      G.PIXEL_WIDTH, G.FDI)
    exp_max = ref.get_max_bal([G.BAL_EXPECTED[d]
                               for d in constants.DIRECTIONS])
    assert_array_equal(outs["max"], exp_max)


def test_convo_vec_present_mask_equals_cropped_aoi():
    # halo semantics: marking a border as absent must equal running the
    # reference on the cropped AOI
    rng = np.random.default_rng(7)
    veg, slope, aspect = _random_classified(rng, (12, 12))
    present = np.zeros((12, 12), dtype=bool)
    present[2:10, 3:11] = True
    veg_pad = np.where(present, veg, constants.NODATA)
    slope_pad = np.where(present, slope, constants.NODATA)
    for d in constants.DIRECTIONS:
        got = kernels.convo_vec(d, veg_pad, slope_pad, aspect, 25.0, 80,
                                present=present)[2:10, 3:11]
        exp = ref.convo(d, veg[2:10, 3:11], slope[2:10, 3:11],
                        aspect[2:10, 3:11], 25.0, 80)
        assert_array_equal(got, exp, err_msg=f"dir={d}")


@pytest.mark.parametrize("seed", range(6))
def test_edge_fill_vec_matches_loops(seed):
    rng = np.random.default_rng(seed)
    shape = (rng.integers(2, 14), rng.integers(2, 14))
    elev = rng.uniform(0, 100, size=shape)
    holes = rng.random(shape) < 0.35
    elev[holes] = constants.NODATA
    got = kernels.edge_fill_vec(elev)
    exp = ref.edge_fill_nodata(elev)
    assert_array_equal(got, exp)


@pytest.mark.parametrize("seed", range(4))
def test_cal_slope_aspect_vec_matches_loops(seed):
    rng = np.random.default_rng(100 + seed)
    shape = (rng.integers(3, 20), rng.integers(3, 20))
    elev = (40 * np.sin(np.arange(shape[0])[:, None] / 3.0)
            * np.cos(np.arange(shape[1]) / 4.0)
            + rng.uniform(0, 5, size=shape))
    elev[rng.random(shape) < 0.15] = constants.NODATA
    gs, ga = kernels.cal_slope_aspect_vec(elev, 25.0, 25.0)
    es, ea = ref.cal_slope_aspect(elev, 25.0, 25.0)
    assert_allclose(gs, es, rtol=0, atol=0)
    assert_allclose(ga, ea, rtol=0, atol=0)


def test_reclassify_sequential_semantics():
    # the in-place cascade: 0 -> 1, then 1 falls inside [0.0001, 5.0001)
    data = np.array([[0.0, 0.5, 5.0, 5.5, 10.0, 20.0, 20.5, -99.0]])
    remap = constants.slope_remap(21.0)
    got = kernels.reclassify_vec(data, remap)
    exp = ref.reclassify_array(data, remap)
    assert_array_equal(got, exp)


def test_reclassify_aspect_remap_and_nodata_keyword():
    rng = np.random.default_rng(3)
    data = rng.uniform(-1, 360, size=(9, 9))
    data[0, :3] = -99.0
    got = kernels.reclassify_vec(data, constants.ASPECT_REMAP)
    exp = ref.reclassify_array(data, constants.ASPECT_REMAP)
    assert_array_equal(got, exp)
    remap = "1 5 2;6 NODATA"
    d2 = np.array([[1.0, 5.0, 6.0, 7.0]])
    assert_array_equal(kernels.reclassify_vec(d2, remap),
                       np.array([[2, 2, -99, 7]]))


def test_zonal_stats_basic_and_empty():
    vals = np.array([3.2, 7.9, -9999.0, 5.5, 1.1])
    s = kernels.zonal_stats_1d(vals)
    flat = np.array([3.2, 7.9, 5.5, 1.1])
    assert s == {"min": int(flat.min()), "max": int(flat.max()),
                 "avg": int(flat.mean()), "std": int(flat.std()),
                 "med": int(np.median(flat)), "pixel_count": 4}
    s2 = kernels.zonal_stats_1d(np.array([-9999.0, -9999.0]))
    assert s2["min"] == -9999 and s2["pixel_count"] == -9999


def test_zonal_stats_circular_wrap():
    vals = np.array([353.0, 15.0, 356.0, 6.0])
    s = kernels.zonal_stats_1d(vals, circular=True)
    wrapped = np.array([353.0, 375.0, 356.0, 366.0])
    assert s["min"] == 6 and s["max"] == 356
    assert s["avg"] == int(np.mean(wrapped) - 360.0)
    assert s["med"] == int(np.median(wrapped) - 360.0)
    assert s["std"] == int(np.std(wrapped))
    # reference uses a strict > 360 check: a mean of exactly 360 is kept
    s2 = kernels.zonal_stats_1d(np.array([350.0, 10.0, 355.0, 5.0]),
                                circular=True)
    assert s2["avg"] == 360


def test_clip_array():
    data = np.arange(100).reshape(10, 10).astype(float)
    # grid: x_left=0, y_upper=100, pixel 10; clip to x [20, 50), y [40, 80)
    out = ref.clip_array(data, 0.0, 100.0, 10.0, 10.0,
                         (20.0, 40.0, 50.0, 80.0))
    assert out.shape == (4, 3)
    assert out[0, 0] == data[2, 2]


def test_slope_in_aspect_reference_golden():
    """The reference's published get_slope_in_aspect fixture
    (reference tests/test_get_slope_in_aspect.py:19-58): slope kept where
    aspect faces west (7), -1 elsewhere, nodata preserved."""
    slope = np.array([[1., 2., -99., 4., 5., 6., 5., 5.],
                      [1., 2., 3., 4., 5., 6., 1., 2.],
                      [3., 3., 5., 4., 4., 5., 4., 4.],
                      [5., 5., 6., 2., -99., 2., 3., 1.],
                      [-99., 2., 3., 5., 2., 3., 2., 3.],
                      [2., 3., 3., 3., 3., 3., 3., 3.],
                      [4., 3., 3., 4., 4., 4., 4., 5.],
                      [4., 4., 1., 3., 4., 5., 6., -99.]])
    aspect = np.array([[7., 7., 7., 7., 7., 7., 7., 9.],
                       [7., 7., 7., 7., 7., 7., 7., 7.],
                       [7., 7., 7., 7., 7., 7., 7., 7.],
                       [7., 7., 1., 7., 2., 7., 7., 7.],
                       [3., 7., 7., 4., 7., 7., 7., 7.],
                       [7., 7., 7., 7., 7., 7., 7., 7.],
                       [7., 7., 7., 7., 7., 7., 7., 7.],
                       [7., 7., 7., 7., 7., 7., 7., 7.]])
    exp = np.array([[1., 2., -99., 4., 5., 6., 5., -1.],
                    [1., 2., 3., 4., 5., 6., 1., 2.],
                    [3., 3., 5., 4., 4., 5., 4., 4.],
                    [5., 5., -1., 2., -99., 2., 3., 1.],
                    [-99., 2., 3., -1., 2., 3., 2., 3.],
                    [2., 3., 3., 3., 3., 3., 3., 3.],
                    [4., 3., 3., 4., 4., 4., 4., 5.],
                    [4., 4., 1., 3., 4., 5., 6., -99.]])
    assert_array_equal(kernels.slope_in_aspect_vec(slope, aspect, 7), exp)
    assert_array_equal(ref.get_slope_in_aspect(slope, aspect, 7), exp)
