"""Single-address serving path — the Gen-2 point-query story.

The reference's second-generation design answers ONE address at a time:
open the national COG, windowed-read only the buffer's pixels, zonal
stats, AS 3959 lookup (reference: testing/02_get_slope_from_buffer.py —
the whole file is this function against S3 COGs). This module is that
path without a Spark job: `geotiff.read_window` supplies the ranged
read, and the SAME kernels the distributed pipeline uses
(`kernels.cal_slope_aspect_vec`, `kernels.zonal_stats_1d`,
`kernels.bal_esti_vec`, the geometry core) produce a row value-identical
to `pipeline.address_bal_factors` — parity is pinned in
tests/test_serve.py, so the batch engine and the serving endpoint can
never drift.
"""

from __future__ import annotations

import math

import numpy as np

from . import geometry, geotiff, kernels
from .constants import ASPECT_REMAP, slope_remap
from .pipeline import composed_remap_intervals


def _remap_scalar(v: float, remap: str) -> int:
    """Scalar twin of pipeline.remap_column (flat piecewise map, identity
    fall-through, int truncation)."""
    for lo, hi, val in composed_remap_intervals(remap):
        if (math.isinf(lo) or v >= lo) and (math.isinf(hi) or v < hi):
            return int(val)
    return int(v)


def _direction_class(az: float) -> int:
    """Scalar twin of pipeline.direction_class — Spark ROUND is
    HALF_UP (away from zero), not banker's rounding."""
    q = az / 45.0
    sector = int(math.floor(abs(q) + 0.5)) * (1 if q >= 0 else -1)
    return sector % 8 + 1


def nearest_vegetation(vegs_pdf, x: float, y: float):
    """Driver-side kNN k=1 with the join's exact semantics: distance 0
    inside (nearest point stays on the boundary, azimuth points at it),
    tie-break (distance, veg_id)."""
    best = None
    px, py = np.array([x]), np.array([y])
    for r in vegs_pdf.itertuples():
        geom = geometry.parse_wkt_polys(r.wkt)
        d, nx, ny = geometry.points_to_geom_distance(px, py, geom)
        inside = bool(geometry.points_in_geom(px, py, geom)[0])
        dist = 0.0 if inside else float(d[0])
        key = (dist, str(r.veg_id))
        if best is None or key < best[0]:
            az = float(geometry.azimuth_deg(x, y, float(nx[0]),
                                            float(ny[0])))
            best = (key, {
                "veg_id": r.veg_id, "bal_number": int(r.bal_number),
                "distance_m": dist, "azimuth_deg": az,
                "near_x": float(nx[0]), "near_y": float(ny[0])})
    return None if best is None else best[1]


def buffer_zonal_medians(dem_file, x: float, y: float,
                         buffer_m: float = 100.0,
                         nodata: float = -99.0):
    """Windowed-read slope/aspect medians around one point: read only
    the buffer bbox (+1 pixel so every in-circle pixel keeps its full
    3x3 slope neighborhood), derive slope/aspect with the tile kernel,
    store-cast to float32 exactly like the tile pipeline, and run the
    same zonal stats over centre-in-circle pixels."""
    info = geotiff.read_info(dem_file)
    px = info.pixel_x
    arr, wx, ty = geotiff.read_window(
        dem_file, x - buffer_m - px, y - buffer_m - px,
        x + buffer_m + px, y + buffer_m + px, info=info)
    if arr.size == 0:
        return -9999, -9999
    dem = arr.astype(np.float64)
    slope, aspect = kernels.cal_slope_aspect_vec(dem, px, px)
    # the tile store holds float32 — match its quantization exactly
    slope = slope.astype(np.float32).astype(np.float64)
    aspect = aspect.astype(np.float32).astype(np.float64)
    n, m = dem.shape
    xs = wx + (np.arange(m) + 0.5) * px
    ys = ty - (np.arange(n) + 0.5) * px
    mask = ((xs[None, :] - x) ** 2
            + (ys[:, None] - y) ** 2) <= buffer_m ** 2
    mask &= dem != nodata
    # the distributed zonal drops nodata per LAYER: slope/aspect can be
    # the sentinel near dem-nodata neighbourhoods even where dem is valid
    s_vals = slope[mask]
    a_vals = aspect[mask]
    s_med = kernels.zonal_stats_1d(s_vals[s_vals != nodata])["med"]
    a_med = kernels.zonal_stats_1d(a_vals[a_vals != nodata],
                                   circular=True)["med"]
    return int(s_med), int(a_med)


def address_bal(dem_file, vegs_pdf, addr_id: str, x: float, y: float,
                fdi: int, buffer_m: float = 100.0) -> dict:
    """One address -> the full BAL-factors row (same columns and values
    as pipeline.address_bal_factors), no cluster required.

    ``dem_file`` is an open binary file (or any seekable reader — an S3
    ranged-read adaptor drops straight in), ``vegs_pdf`` a pandas frame
    of (veg_id, bal_number, wkt)."""
    knn = nearest_vegetation(vegs_pdf, x, y)
    if knn is None:
        raise ValueError("no vegetation rows supplied")
    s_med, a_med = buffer_zonal_medians(dem_file, x, y, buffer_m)
    slope_class = -99 if s_med == -9999 \
        else _remap_scalar(float(s_med), slope_remap(90.0))
    aspect_class = -99 if a_med == -9999 \
        else _remap_scalar(float(a_med), ASPECT_REMAP)
    dir_class = _direction_class(knn["azimuth_deg"])
    if slope_class == -99:
        eff = -99
    elif aspect_class == dir_class:
        eff = slope_class
    else:
        eff = -1
    bal = float(kernels.bal_esti_vec(
        np.array([knn["bal_number"]]), np.array([knn["distance_m"]]),
        np.array([eff]), int(fdi))[0])
    return {
        "addr_id": addr_id, "fdi": int(fdi), "veg_id": knn["veg_id"],
        "bal_number": knn["bal_number"],
        "distance_m": knn["distance_m"],
        "azimuth_deg": knn["azimuth_deg"],
        "slope_med_deg": s_med, "aspect_med_deg": a_med,
        "slope_class": slope_class, "aspect_class": aspect_class,
        "dir_class": dir_class, "eff_slope_code": eff, "bal": bal,
    }
