"""Integer grid-cell spatial index — the engine's H3/S2 stand-in.

A uniform square grid over the projected plane: cell (cx, cy) =
(floor(x / cell_m), floor(y / cell_m)). The single cell id packs both
coordinates so spatial joins become plain equi-joins, and a Morton (Z-order)
key provides the locality-preserving sort used for range partitioning — the
Spark substitute for the reference's GiST index + CLUSTER
(reference: data_prep/vegetation/03_explode_multipolygons_and_classify.sql:30-31,
data_prep/vegetation/04_merge_geometries.py:214-221).

Everything here is closed-form integer math: identical results are trivially
expressible in ANSI SQL for the DuckDB oracles, and the numpy forms vectorize
inside pandas UDFs. A production deployment can swap in H3 by replacing this
module (same cover/ring API).
"""

from __future__ import annotations

import numpy as np

# cell coordinates are offset into unsigned space so ids stay non-negative;
# supports world coordinates in cells [-2^19, 2^19)
_OFFSET = 1 << 19
_BITS = 20
_MASK = (1 << _BITS) - 1

DEFAULT_CELL_M = 400.0  # 100 m consideration distance => ring-1 suffices


def cell_xy(x, y, cell_m: float = DEFAULT_CELL_M):
    """(x, y) metres -> integer cell coords. Vectorized."""
    cx = np.floor(np.asarray(x, dtype=np.float64) / cell_m).astype(np.int64)
    cy = np.floor(np.asarray(y, dtype=np.float64) / cell_m).astype(np.int64)
    return cx, cy


def pack(cx, cy):
    """Cell coords -> single int64 id: (cx + OFFSET) * 2^20 + (cy + OFFSET).

    SQL twin: ``(floor(x/cell) + 524288) * 1048576 + (floor(y/cell) + 524288)``.
    """
    cx = np.asarray(cx, dtype=np.int64)
    cy = np.asarray(cy, dtype=np.int64)
    return (cx + _OFFSET) * (1 << _BITS) + (cy + _OFFSET)


def unpack(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.int64)
    cx = (cell_id >> _BITS) - _OFFSET
    cy = (cell_id & _MASK) - _OFFSET
    return cx, cy


def cell_id(x, y, cell_m: float = DEFAULT_CELL_M):
    cx, cy = cell_xy(x, y, cell_m)
    return pack(cx, cy)


def morton_key(cx, cy):
    """Interleave cell coords into a Z-order key for spatial range
    partitioning (locality-preserving sort order)."""
    def spread(v):
        v = np.asarray(v, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    ux = np.asarray(cx, dtype=np.int64) + _OFFSET
    uy = np.asarray(cy, dtype=np.int64) + _OFFSET
    return (spread(ux) | (spread(uy) << np.uint64(1))).astype(np.int64)


def cover_bbox(xmin, ymin, xmax, ymax, cell_m: float = DEFAULT_CELL_M):
    """All cell ids whose cell intersects the bbox. Scalar bbox -> 1-D array.
    This is the polygon->cover primitive of the PIP/zonal joins: bbox cover +
    exact refine replaces the reference's GiST bbox prefilter
    (reference: data_prep/vegetation/xx_fiona_testing.py:133-136)."""
    cx0 = int(np.floor(xmin / cell_m))
    cx1 = int(np.floor(xmax / cell_m))
    cy0 = int(np.floor(ymin / cell_m))
    cy1 = int(np.floor(ymax / cell_m))
    cxs, cys = np.meshgrid(np.arange(cx0, cx1 + 1),
                           np.arange(cy0, cy1 + 1), indexing="ij")
    return pack(cxs.ravel(), cys.ravel())
