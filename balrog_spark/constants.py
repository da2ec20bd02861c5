"""AS 3959 (2009) Method-1 constant tables, stored as plain data.

Values transcribed from Tables 2.4.2-2.4.5 of Australian Standard AS 3959
(2009) as published in the reference implementation
(reference: utilities/bal_database.py:14-184, utilities/value_lookup.py:14-53).
This module holds *data only*; the dense numpy lookup arrays used by the
vectorized kernels are derived once in :func:`build_lookup`.

Conventions (identical to the reference):
- FDI in {100, 80, 50, 40}
- vegetation classes 1..7 (forest, woodland, shrubland, scrub, mallee/mulga,
  rainforest, grassland); -99 = nodata
- slope classes: 1 = flat(0 deg), 2 = (0,5], 3 = (5,10], 4 = (10,15],
  5 = (15,20], 6 = >20 deg downslope; -1 = upslope sentinel; -99 = nodata
- BAL levels: distance class 1..5 -> {100, 40, 29, 19, 12.5}; Flame Zone = 200
- NODATA = -99 everywhere in raster space
"""

from __future__ import annotations

import numpy as np

NODATA = -99.0
FZ_BAL = 200.0
UPSLOPE = -1.0

FDI_VALUES = (100, 80, 50, 40)
VEG_CLASSES = (1, 2, 3, 4, 5, 6, 7)
SLOPE_CLASSES = (1, 2, 3, 4, 5, 6)

# distance-class 1..5 -> BAL rating (reference: bal_database.py:179-184)
BAL_BY_DIST_CLASS = {1: 100.0, 2: 40.0, 3: 29.0, 4: 19.0, 5: 12.5}

# Compass value per scan direction (reference: value_lookup.py:15-23).
DIRECTION_ASPECT = {
    "n": 1, "ne": 2, "e": 3, "se": 4, "s": 5, "sw": 6, "w": 7, "nw": 8,
    "none": 9,
}

DIRECTIONS = ("w", "e", "n", "s", "nw", "ne", "se", "sw")

# (row_step, col_step) unit offsets per direction: neighbour m of cell (i, j)
# is (i + m*row_step, j + m*col_step) (reference: value_lookup.py:36-53).
DIRECTION_STEPS = {
    "w": (0, -1), "e": (0, 1), "n": (-1, 0), "s": (1, 0),
    "nw": (-1, -1), "ne": (-1, 1), "sw": (1, -1), "se": (1, 1),
}

# Upslope/flat distance thresholds [fdi][veg] -> 4 class boundaries (metres).
# Transcribed from AS 3959 via reference bal_database.py:24-51.
_UP = {
    100: {1: (19, 25, 35, 48), 2: (12, 16, 24, 33), 3: (7, 9, 13, 19),
          4: (10, 13, 19, 27), 5: (6, 8, 12, 17), 6: (8, 11, 16, 23),
          7: (6, 9, 13, 19)},
    80:  {1: (16, 21, 31, 42), 2: (10, 14, 20, 29), 3: (7, 9, 13, 19),
          4: (10, 13, 19, 27), 5: (6, 8, 12, 17), 6: (6, 9, 13, 19),
          7: (6, 8, 12, 17)},
    50:  {1: (12, 16, 23, 32), 2: (7, 10, 15, 22), 3: (7, 9, 13, 19),
          4: (10, 13, 19, 27), 5: (6, 8, 12, 17), 6: (5, 6, 9, 14),
          7: (7, 9, 14, 20)},
    40:  {1: (10, 13, 20, 28), 2: (6, 9, 13, 19), 3: (7, 9, 13, 19),
          4: (10, 13, 19, 27), 5: (6, 8, 12, 17), 6: (4, 5, 8, 12),
          7: (4, 5, 8, 12)},
}

# Downslope thresholds [fdi][slope_class][veg] -> 4 class boundaries.
# Slope classes 2..5 only (class 6 is Flame Zone, class 1/-1 use _UP).
# Transcribed from AS 3959 via reference bal_database.py:54-173.
_DOWN = {
    100: {
        2: {1: (24, 32, 43, 57), 2: (15, 21, 29, 41), 3: (7, 10, 15, 22),
            4: (11, 15, 22, 31), 5: (7, 9, 13, 20), 6: (10, 14, 20, 29),
            7: (7, 10, 15, 22)},
        3: {1: (31, 39, 53, 69), 2: (20, 26, 37, 50), 3: (8, 11, 17, 25),
            4: (12, 17, 24, 35), 5: (7, 10, 15, 23), 6: (13, 18, 26, 36),
            7: (8, 11, 17, 25)},
        4: {1: (39, 49, 64, 82), 2: (25, 33, 45, 60), 3: (9, 13, 19, 28),
            4: (14, 19, 28, 39), 5: (8, 11, 18, 26), 6: (17, 23, 33, 45),
            7: (9, 13, 20, 28)},
        5: {1: (50, 61, 78, 98), 2: (32, 41, 56, 73), 3: (10, 15, 22, 31),
            4: (15, 21, 31, 43), 5: (9, 13, 20, 29), 6: (22, 29, 42, 56),
            7: (11, 15, 23, 32)},
    },
    80: {
        2: {1: (20, 27, 37, 50), 2: (13, 17, 25, 35), 3: (7, 10, 15, 22),
            4: (11, 15, 22, 31), 5: (7, 9, 13, 20), 6: (8, 11, 17, 24),
            7: (7, 9, 14, 20)},
        3: {1: (26, 33, 46, 61), 2: (16, 22, 31, 43), 3: (8, 11, 17, 25),
            4: (12, 17, 24, 35), 5: (7, 10, 15, 23), 6: (11, 15, 22, 31),
            7: (8, 10, 16, 23)},
        4: {1: (33, 42, 56, 73), 2: (21, 28, 39, 53), 3: (9, 13, 19, 28),
            4: (14, 19, 28, 39), 5: (8, 11, 18, 26), 6: (14, 19, 28, 39),
            7: (9, 12, 18, 26)},
        5: {1: (42, 52, 68, 87), 2: (27, 35, 48, 64), 3: (10, 15, 22, 31),
            4: (15, 21, 31, 43), 5: (9, 13, 20, 29), 6: (18, 25, 36, 48),
            7: (10, 14, 21, 30)},
    },
    50: {
        2: {1: (14, 19, 27, 38), 2: (9, 12, 18, 26), 3: (7, 10, 15, 22),
            4: (11, 15, 22, 31), 5: (7, 9, 13, 20), 6: (6, 8, 12, 17),
            7: (8, 10, 16, 23)},
        3: {1: (18, 24, 34, 46), 2: (11, 15, 23, 32), 3: (8, 11, 17, 25),
            4: (12, 17, 24, 35), 5: (7, 10, 15, 23), 6: (7, 10, 15, 22),
            7: (9, 12, 18, 26)},
        4: {1: (22, 30, 41, 56), 2: (14, 19, 28, 40), 3: (9, 13, 19, 28),
            4: (14, 19, 28, 39), 5: (8, 11, 18, 26), 6: (9, 13, 19, 28),
            7: (10, 13, 20, 29)},
        5: {1: (28, 37, 51, 67), 2: (18, 25, 36, 48), 3: (10, 15, 22, 31),
            4: (15, 21, 31, 43), 5: (9, 13, 20, 29), 6: (12, 17, 25, 35),
            7: (11, 15, 23, 33)},
    },
    40: {
        2: {1: (12, 16, 24, 34), 2: (8, 11, 16, 23), 3: (7, 10, 15, 22),
            4: (11, 15, 22, 31), 5: (7, 9, 13, 20), 6: (5, 7, 10, 15),
            7: (4, 6, 9, 14)},
        3: {1: (15, 20, 29, 41), 2: (9, 13, 19, 28), 3: (8, 11, 17, 25),
            4: (12, 17, 24, 35), 5: (7, 10, 15, 23), 6: (6, 8, 13, 19),
            7: (5, 7, 11, 16)},
        4: {1: (19, 25, 36, 49), 2: (12, 16, 24, 35), 3: (9, 13, 19, 28),
            4: (14, 19, 28, 39), 5: (8, 11, 18, 26), 6: (8, 11, 16, 24),
            7: (6, 8, 13, 19)},
        5: {1: (24, 31, 44, 59), 2: (15, 21, 31, 42), 3: (10, 15, 22, 31),
            4: (15, 21, 31, 43), 5: (9, 13, 20, 29), 6: (10, 14, 21, 30),
            7: (7, 9, 15, 22)},
    },
}


def upslope_limits(fdi: int, veg: int) -> tuple:
    """Distance thresholds for flat/upslope terrain."""
    return _UP[fdi][veg]


def downslope_limits(fdi: int, slope_class: int, veg: int) -> tuple:
    """Distance thresholds for downslope classes 2..5."""
    return _DOWN[fdi][slope_class][veg]


# --- dense lookup arrays for vectorized kernels -----------------------------
#
# Index spaces:
#   fdi_idx:   0..3   for FDI (100, 80, 50, 40)
#   slope_idx: 0..7   for slope codes (-99, -1, 1, 2, 3, 4, 5, 6)
#   veg_idx:   0..8   for veg codes (-99, 1..7, <other>)  (last = unknown)
#   dist_cls:  0..4   for distance classes 1..5
#
# THRESH[f, s, v, 0:4]   distance class boundaries (+inf when class is fixed)
# BALVAL[f, s, v, 0:5]   BAL value per distance class
#
# A cell's BAL is then  BALVAL[f, s, v, sum(dist >= THRESH[f, s, v])]  which
# exactly replays reference calculate_bal.py:223-297 (find_dist_class +
# bal_esti) as pure vector indexing.

SLOPE_CODES = (-99, -1, 1, 2, 3, 4, 5, 6)
VEG_CODES = (-99, 1, 2, 3, 4, 5, 6, 7)

_INF = float("inf")


def build_lookup():
    """Build (THRESH, BALVAL, slope_index_map, veg_index_map).

    The index maps are offset arrays: ``slope_index_map[code + 99]`` gives the
    slope index for integer codes in [-99, 6]; out-of-range codes must be
    clamped by the caller (classified rasters only contain known codes).
    """
    n_f, n_s, n_v = len(FDI_VALUES), len(SLOPE_CODES), len(VEG_CODES)
    thresh = np.full((n_f, n_s, n_v, 4), _INF, dtype=np.float64)
    balval = np.full((n_f, n_s, n_v, 5), NODATA, dtype=np.float64)

    bal_seq = [BAL_BY_DIST_CLASS[c] for c in (1, 2, 3, 4, 5)]

    for fi, fdi in enumerate(FDI_VALUES):
        for si, scode in enumerate(SLOPE_CODES):
            for vi, vcode in enumerate(VEG_CODES):
                if scode == -99:
                    continue  # nodata slope -> BAL -99 regardless of dist
                if vcode == -99:
                    continue  # nodata veg -> BAL -99 (for scode != -99)
                if scode == 6:
                    balval[fi, si, vi, :] = FZ_BAL  # Flame Zone
                    continue
                if scode in (-1, 1):
                    limits = upslope_limits(fdi, vcode)
                else:
                    limits = downslope_limits(fdi, scode, vcode)
                thresh[fi, si, vi, :] = limits
                balval[fi, si, vi, :] = bal_seq

    smap = np.zeros(256, dtype=np.int64)
    for i, c in enumerate(SLOPE_CODES):
        smap[int(c) + 99] = i
    vmap = np.zeros(256, dtype=np.int64)
    for i, c in enumerate(VEG_CODES):
        vmap[int(c) + 99] = i
    return thresh, balval, smap, vmap


THRESH, BALVAL, SLOPE_INDEX_MAP, VEG_INDEX_MAP = build_lookup()

FDI_INDEX = {f: i for i, f in enumerate(FDI_VALUES)}

# Default remap strings used by the reference pipeline.
# Aspect degrees -> classes 1..9 (reference: bal.py:106-108).
ASPECT_REMAP = ("-1 0 9;0 22.5 1;22.5 67.5 2;67.5 112.5 3;112.5 157.5 4;"
                "157.5 202.5 5;202.5 247.5 6;247.5 292.5 7;292.5 337.5 8;"
                "337.5 360 1")


def slope_remap(value_max: float) -> str:
    """Slope degrees -> classes 1..6 with data-dependent upper bound
    (reference: bal.py:110-120)."""
    import math
    if float(value_max) < 20:
        value_max = 20.0001
    return ("0 0 1;0.0001 5 2;5.0001 10 3;10.0001 15 4;15.0001 20 5;"
            "20.0001 " + str(math.ceil(float(value_max))) + " 6")


# vegetation class number -> human name, the reference's nvis6_lookup
# mapping (reference: data_prep/vegetation/02_create_nvis_bal_map_table.sql:
# 16-63; output column 05_create_tables.sql:9 bal_name)
BAL_NAMES = {
    1: "forest",
    2: "woodland",
    3: "shrubland",
    4: "scrub",
    5: "mallee or mulga",
    6: "rainforest",
    7: "grassland or tussock moorland",
    -9999: "not applicable",
}
