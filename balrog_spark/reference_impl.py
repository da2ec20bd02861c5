"""Pure-numpy oracle of the reference BAL semantics — TEST USE ONLY.

Faithful, loop-level re-statements of the reference algorithms
(reference: calculate_bal.py, utilities/sa_tools.py, utilities/value_lookup.py)
with arcpy I/O removed. These run the *same control flow* as the reference so
the vectorized engine kernels in :mod:`balrog_spark.kernels` can be asserted
array-equal against them. Never used on the Spark hot path.

Quirks preserved on purpose (they are part of the observable semantics):
- reclassify mutates the array range-by-range in order, so a newly assigned
  class value that falls inside a later range is remapped again
  (reference: sa_tools.py:172-194).
- the third/fourth nodata edge-fill sweeps read index ``j-1`` while iterating
  ``j`` downward, so at ``j == 0`` numpy wraps to the last row/column
  (reference: sa_tools.py:255-265).
- grassland (veg 7) at FDI != 50 and distance >= 50 m forces BAL to nodata
  *after* every other rule (reference: calculate_bal.py:291-296).
"""

from __future__ import annotations

import numpy as np

from .constants import (
    BAL_BY_DIST_CLASS,
    DIRECTION_ASPECT,
    DIRECTION_STEPS,
    FZ_BAL,
    NODATA,
    downslope_limits,
    upslope_limits,
)

RADIANS_PER_DEGREE = 0.01745329251994329576923690768489


def find_dist_class(dist: float, dist_limit) -> int:
    """Bucket a distance against 4 thresholds -> class 1..5
    (reference: calculate_bal.py:223-245)."""
    for k in range(4):
        if dist < dist_limit[k]:
            return k + 1
    return 5


def bal_esti(veg: float, dist: float, slope: float, fdi: int) -> float:
    """Scalar BAL classifier (reference: calculate_bal.py:248-297)."""
    if slope == NODATA:
        bal = NODATA
    elif slope == 6:  # downslope > 20 deg -> Flame Zone
        bal = NODATA if veg == NODATA else FZ_BAL
    elif slope in (-1, 1):  # flat or upslope
        if veg == NODATA:
            bal = NODATA
        else:
            bal = BAL_BY_DIST_CLASS[
                find_dist_class(dist, upslope_limits(fdi, int(veg)))]
    else:  # downslope classes 2..5
        if veg == NODATA:
            bal = NODATA
        else:
            bal = BAL_BY_DIST_CLASS[
                find_dist_class(dist,
                                downslope_limits(fdi, int(slope), int(veg)))]

    # grassland is only considered out to 50 m unless FDI == 50
    if fdi != 50 and veg == 7 and dist >= 50:
        bal = NODATA
    return bal


def get_slope_in_aspect(slope_data, aspect_data, aspect_value):
    """Slope where the aspect faces the scan direction, -1 (upslope)
    elsewhere, nodata preserved (reference: calculate_bal.py:119-142)."""
    out = np.full(slope_data.shape, -1.0, dtype=np.float32)
    out[slope_data == NODATA] = NODATA
    hit = aspect_data == aspect_value
    out[hit] = slope_data[hit]
    return out


def n_neighbours(direction: str, i: int, j: int, rows: int, cols: int) -> int:
    """Number of in-bounds neighbours from (i, j) along a direction
    (reference: value_lookup.py:26-33)."""
    dr, dc = DIRECTION_STEPS[direction]
    avail_r = rows - i - 1 if dr > 0 else (i if dr < 0 else None)
    avail_c = cols - j - 1 if dc > 0 else (j if dc < 0 else None)
    if avail_r is None:
        return avail_c
    if avail_c is None:
        return avail_r
    return min(avail_r, avail_c)


def convo(direction, veg_data, slope_data, aspect_data, pixel_width, fdi):
    """Directional neighbour scan: per-cell max BAL over neighbours out to
    100 m in one compass direction (reference: calculate_bal.py:145-220)."""
    aspect_value = DIRECTION_ASPECT[direction]
    if direction in ("w", "e", "n", "s"):
        dire_width = pixel_width
    else:
        dire_width = pixel_width * 1.414  # reference uses 1.414, not sqrt(2)
    filter_width = int(np.ceil(100.0 / dire_width))

    rows, cols = veg_data.shape
    sia = get_slope_in_aspect(slope_data, aspect_data, aspect_value)
    dr, dc = DIRECTION_STEPS[direction]

    out = np.zeros((rows, cols), np.float32)
    for i in range(rows):
        for j in range(cols):
            m_max = min(n_neighbours(direction, i, j, rows, cols),
                        filter_width)
            best = None
            for m in range(1, m_max + 1):
                r, c = i + m * dr, j + m * dc
                dist = (m - 1) * dire_width + 0.5 * dire_width
                b = bal_esti(veg_data[r, c], dist, sia[r, c], fdi)
                if best is None or b > best:
                    best = b
            out[i, j] = NODATA if best is None else best
    return out


def get_max_bal(bal_list):
    """Elementwise max across direction arrays
    (reference: calculate_bal.py:104-116)."""
    return np.dstack(tuple(bal_list)).max(2)


def reclassify_array(data, remap: str):
    """Range-remap DSL applied sequentially in place, then int cast
    (reference: sa_tools.py:139-202).

    DSL: ``"lo hi new;..."`` or ``"value new"``; end bound expanded by 1e-4 to
    make it inclusive; ``NODATA`` keyword maps to -99. Later ranges see the
    results of earlier ones (intentional reference behaviour).
    """
    data = np.array(data, dtype=np.float64, copy=True)
    for a_map in remap.split(";"):
        parts = a_map.lstrip().split(" ")
        if len(parts) == 2:
            start, end, new = float(parts[0]), float(parts[0]), parts[1]
        else:
            start, end, new = float(parts[0]), float(parts[1]), parts[2]
        end += 0.0001
        new_value = NODATA if new == "NODATA" else int(new)
        data[(data >= start) & (data < end)] = new_value
    return data.astype(int)


def clip_array(data, x_left, y_upper, pixelwidth, pixelheight, extent):
    """Clip a row-major array to a sub-extent by grid arithmetic
    (reference: sa_tools.py:20-45)."""
    x_start = int(np.around((extent[0] - x_left) / pixelwidth))
    y_start = int(np.around((y_upper - extent[3]) / pixelheight))
    cols = int(np.around((extent[2] - extent[0]) / pixelwidth))
    rows = int(np.around((extent[3] - extent[1]) / pixelheight))
    return data[y_start:y_start + rows, x_start:x_start + cols]


def edge_fill_nodata(elev):
    """The four sequential nodata edge-fill sweeps, verbatim control flow
    (reference: sa_tools.py:242-265), including the j-1 wrap at j == 0."""
    elev = np.array(elev, dtype=np.float64, copy=True)
    nd = NODATA
    nx, ny = elev.shape
    for i in range(ny):
        for j in range(nx - 1):
            if elev[j + 1, i] == nd and elev[j, i] != nd:
                elev[j + 1, i] = elev[j, i]
    for i in range(nx):
        for j in range(ny - 1):
            if elev[i, j + 1] == nd and elev[i, j] != nd:
                elev[i, j + 1] = elev[i, j]
    for i in range(ny):
        for j in range(nx - 1, -1, -1):
            if elev[j, i] == nd and elev[j - 1, i] != nd:
                elev[j, i] = elev[j - 1, i]
    for i in range(nx):
        for j in range(ny - 1, -1, -1):
            if elev[i, j] == nd and elev[i, j - 1] != nd:
                elev[i, j] = elev[i, j - 1]
    return elev


def cal_slope_aspect(elev, pixel_w, pixel_h):
    """Slope (degrees) and compass aspect from a DEM array
    (reference: sa_tools.py:205-293)."""
    elev = np.array(elev, dtype=np.float64, copy=True)
    mask = elev == NODATA
    elev = edge_fill_nodata(elev)
    dzdx, dzdy = np.gradient(elev, pixel_w, pixel_h)
    slope = np.arctan(np.hypot(dzdx, dzdy)) / RADIANS_PER_DEGREE
    slope[mask] = NODATA
    aspect = np.mod(450.0 - np.arctan2(dzdy, -dzdx) / RADIANS_PER_DEGREE,
                    360.0)
    aspect[mask] = NODATA
    return slope, aspect
