"""Tiled raster operators — the Gen-1 BAL pipeline as one Spark DAG.

The reference computes slope/aspect, reclassification, and the 8-direction
BAL scan over a single in-memory AOI raster (reference: bal.py:202-230,
calculate_bal.py:21-101). Here the AOI is a set of fixed-size tiles in a
DataFrame; cross-tile dependencies are satisfied by a *border-strip fan-out*:

    tiles --mapInPandas--> 9 contribution rows each (self + 8 border strips,
                           only the <=halo-wide slices a neighbour needs)
          --groupBy(tile)--> applyInPandas: assemble padded array, run the
                           vectorized kernel chain, emit core results

One shuffle total, inflated only by ~(1 + 4*halo/tile_n) (~1.4x at halo 13 /
tile 64; ~1.1x at the 256-px production tile size). This is the scale story:
no global array ever exists, every group is O(tile^2), and the shuffle key
(tile_x, tile_y) is uniform by construction so no salting is needed here.

Exactness contract: a core cell's BAL matches the reference's whole-AOI
computation whenever halo >= scan_width + 1 + (longest nodata run near a
tile border); AOI edges are reproduced by cropping absent halo sides so the
one-sided gradient behaviour at array edges lines up (verified end-to-end in
tests/test_raster_pipeline.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

from . import kernels
from .constants import ASPECT_REMAP, NODATA, slope_remap
from .corpus import VEG_REMAP
from .schema import BAL_TILES

# default halo: scan width 4 (ceil(100/25)) + 1 gradient px + 8 px worst-case
# nodata run in the synthetic corpus
DEFAULT_HALO = 13

_CONTRIB = StructType([
    StructField("tile_x", IntegerType(), False),
    StructField("tile_y", IntegerType(), False),
    StructField("ox", IntegerType(), False),
    StructField("oy", IntegerType(), False),
    StructField("layer", StringType(), False),
    StructField("x0", LongType(), False),   # millimetre-quantized, exact
    StructField("y0", LongType(), False),
    StructField("pixel_mm", LongType(), False),
    StructField("nrows", IntegerType(), False),
    StructField("ncols", IntegerType(), False),
    StructField("srows", IntegerType(), False),
    StructField("scols", IntegerType(), False),
    StructField("data", ArrayType(FloatType()), False),
])


def emit_border_strips(tiles: DataFrame, halo: int = DEFAULT_HALO
                       ) -> DataFrame:
    """Fan each tile out to itself + 8 neighbours, shipping only the border
    slice the neighbour's halo needs."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                n, m = int(r.nrows), int(r.ncols)
                h = min(halo, n, m)
                arr = np.asarray(r.data, dtype=np.float32).reshape(n, m)
                for ox in (-1, 0, 1):
                    for oy in (-1, 0, 1):
                        # this tile serves as neighbour (ox, oy) of target
                        rs = slice(None) if oy == 0 else (
                            slice(n - h, n) if oy == 1 else slice(0, h))
                        cs = slice(None) if ox == 0 else (
                            slice(m - h, m) if ox == -1 else slice(0, h))
                        strip = arr[rs, cs]
                        out.append({
                            "tile_x": int(r.tile_x) - ox,
                            "tile_y": int(r.tile_y) - oy,
                            "ox": ox, "oy": oy, "layer": r.layer,
                            "x0": int(round(r.x0 * 1000)),
                            "y0": int(round(r.y0 * 1000)),
                            "pixel_mm": int(round(r.pixel_m * 1000)),
                            "nrows": n, "ncols": m,
                            "srows": strip.shape[0],
                            "scols": strip.shape[1],
                            "data": strip.ravel(),
                        })
            yield pd.DataFrame(out, columns=[f.name for f in _CONTRIB])

    return tiles.mapInPandas(gen, schema=_CONTRIB)


def _assemble(group: pd.DataFrame, layer: str, halo: int):
    """Rebuild (padded_array, present_mask, meta) for one tile group; absent
    cells are filled with nodata (-99) and marked not-present."""
    g = group[group.layer == layer]
    self_rows = g[(g.ox == 0) & (g.oy == 0)]
    if len(self_rows) == 0:
        return None
    s = self_rows.iloc[0]
    n, m = int(s.nrows), int(s.ncols)
    h = min(halo, n, m)
    pad = np.full((n + 2 * h, m + 2 * h), NODATA, dtype=np.float64)
    present = np.zeros_like(pad, dtype=bool)
    for r in g.itertuples():
        rows0 = 0 if r.oy == 1 else (h if r.oy == 0 else h + n)
        cols0 = 0 if r.ox == -1 else (h if r.ox == 0 else h + m)
        block = np.asarray(r.data, dtype=np.float64).reshape(r.srows, r.scols)
        pad[rows0:rows0 + r.srows, cols0:cols0 + r.scols] = block
        present[rows0:rows0 + r.srows, cols0:cols0 + r.scols] = True
    meta = {"nrows": n, "ncols": m, "halo": h,
            "x0": s.x0 / 1000.0, "y0": s.y0 / 1000.0,
            "pixel_m": s.pixel_mm / 1000.0}
    return pad, present, meta


def _crop_absent_sides(arrays, present, h, n, m):
    """Drop halo rows/cols on sides with no neighbour so array edges coincide
    with AOI edges (matches np.gradient's one-sided differences there)."""
    top = 0 if present[:h, h:h + m].any() else h
    bot = present.shape[0] if present[h + n:, h:h + m].any() \
        else present.shape[0] - h
    left = 0 if present[h:h + n, :h].any() else h
    right = present.shape[1] if present[h:h + n, h + m:].any() \
        else present.shape[1] - h
    sl = (slice(top, bot), slice(left, right))
    return [a[sl] for a in arrays], present[sl], h - top, h - left


def bal_tiles(tiles: DataFrame, fdi: int, halo: int = DEFAULT_HALO,
              veg_remap: str = VEG_REMAP,
              slope_max: float = 90.0) -> DataFrame:
    """The full Gen-1 pipeline per tile: veg reclass -> slope/aspect ->
    aspect/slope reclass -> 8-direction scan -> max
    (reference: bal.py:202-230 + calculate_bal.py:21-101), emitting 9 BAL
    arrays per tile.

    ``slope_max`` bounds the slope remap's top class; pass the output of
    :func:`dynamic_slope_max` for the reference's data-dependent bound
    (reference: bal.py:110-120) — any bound >= the true max is
    value-identical because arctan slopes never exceed 90 deg and earlier
    remap classes (1..6) lie below every range start.
    """
    contribs = emit_border_strips(tiles, halo)
    aspect_remap_s = ASPECT_REMAP
    slope_remap_s = slope_remap(slope_max)

    def compute(key, group: pd.DataFrame):
        dem = _assemble(group, "dem", halo)
        veg = _assemble(group, "veg", halo)
        if dem is None or veg is None:
            return pd.DataFrame(columns=[f.name for f in BAL_TILES])
        dem_pad, present, meta = dem
        veg_pad, _, _ = veg
        n, m, h = meta["nrows"], meta["ncols"], meta["halo"]
        (dem_c, veg_c), present_c, core_r, core_c = _crop_absent_sides(
            [dem_pad, veg_pad], present, h, n, m)

        slope_deg, aspect_deg = kernels.cal_slope_aspect_vec(
            dem_c, meta["pixel_m"], meta["pixel_m"])
        veg_r = kernels.reclassify_vec(veg_c, veg_remap)
        aspect_r = kernels.reclassify_vec(aspect_deg, aspect_remap_s)
        slope_r = kernels.reclassify_vec(slope_deg, slope_remap_s)

        outs = kernels.bal_all_directions(
            veg_r.astype(np.float64), slope_r.astype(np.float64),
            aspect_r.astype(np.float64), meta["pixel_m"], fdi,
            present=present_c)
        sl = (slice(core_r, core_r + n), slice(core_c, core_c + m))
        row = {"tile_x": int(key[0]), "tile_y": int(key[1]),
               "x0": meta["x0"], "y0": meta["y0"],
               "pixel_m": meta["pixel_m"], "nrows": n, "ncols": m}
        for d in ("w", "e", "n", "s", "nw", "ne", "se", "sw", "max"):
            row[f"bal_{d}"] = outs[d][sl].astype(np.float32).ravel()
        return pd.DataFrame([row])

    return contribs.groupBy("tile_x", "tile_y").applyInPandas(
        compute, schema=BAL_TILES)


def slope_aspect_tiles(tiles: DataFrame, halo: int = DEFAULT_HALO,
                       classify: bool = True,
                       slope_max: float = 90.0) -> DataFrame:
    """Derive slope/aspect tile layers from DEM tiles (R4 + R5/R6), halo-
    exact like :func:`bal_tiles`. Emits two rows per tile with
    layer 'slope_r'/'aspect_r' (classified) or 'slope'/'aspect' (degrees),
    same TILES schema, so downstream zonal stats and the per-address BAL
    pipeline consume them like any raster layer
    (reference: bal.py:76-143 get_slope_aspect)."""
    from .schema import TILES

    dem = tiles.filter(F.col("layer") == "dem")
    contribs = emit_border_strips(dem, halo)
    aspect_remap_s = ASPECT_REMAP
    slope_remap_s = slope_remap(slope_max)

    def compute(key, group: pd.DataFrame):
        got = _assemble(group, "dem", halo)
        if got is None:
            return pd.DataFrame(columns=[f.name for f in TILES])
        dem_pad, present, meta = got
        n, m, h = meta["nrows"], meta["ncols"], meta["halo"]
        (dem_c,), present_c, core_r, core_c = _crop_absent_sides(
            [dem_pad], present, h, n, m)
        slope_deg, aspect_deg = kernels.cal_slope_aspect_vec(
            dem_c, meta["pixel_m"], meta["pixel_m"])
        if classify:
            slope_out = kernels.reclassify_vec(slope_deg, slope_remap_s) \
                .astype(np.float32)
            aspect_out = kernels.reclassify_vec(aspect_deg, aspect_remap_s) \
                .astype(np.float32)
            names = ("slope_r", "aspect_r")
        else:
            slope_out = slope_deg.astype(np.float32)
            aspect_out = aspect_deg.astype(np.float32)
            names = ("slope", "aspect")
        sl = (slice(core_r, core_r + n), slice(core_c, core_c + m))
        tx, ty = int(key[0]), int(key[1])
        rows = []
        for name, arr in zip(names, (slope_out, aspect_out)):
            rows.append({
                "media_ref": f"{name}/{tx}/{ty}", "layer": name,
                "tile_x": tx, "tile_y": ty,
                "x0": meta["x0"], "y0": meta["y0"],
                "pixel_m": meta["pixel_m"], "nrows": n, "ncols": m,
                "data": arr[sl].ravel(),
            })
        return pd.DataFrame(rows, columns=[f.name for f in TILES])

    return contribs.groupBy("tile_x", "tile_y").applyInPandas(
        compute, schema=TILES)


def dynamic_slope_max(tiles: DataFrame) -> float:
    """The reference's two-job dynamic remap bound: global max slope, then
    remap (reference: bal.py:110-120). One cheap columnar pass (higher-order
    array max, no UDF, no shuffle beyond the final agg)."""
    dem = tiles.filter(F.col("layer") == "dem")
    # max finite DEM gradient bound: cheap per-tile slope max via UDF-free
    # approximation is not possible (gradient), so compute per-tile slope max
    # in a slim pandas UDF and agg
    out_schema = StructType([StructField("mx", FloatType(), True)])

    def tile_max(batches):
        for pdf in batches:
            vals = []
            for r in pdf.itertuples():
                arr = np.asarray(r.data, dtype=np.float64).reshape(
                    r.nrows, r.ncols)
                s, _ = kernels.cal_slope_aspect_vec(arr, r.pixel_m, r.pixel_m)
                s = s[s != NODATA]
                if s.size:
                    vals.append(float(s.max()))
            yield pd.DataFrame({"mx": vals or [None]})

    row = dem.mapInPandas(tile_max, schema=out_schema) \
        .agg(F.max("mx").alias("mx")).collect()[0]
    return float(row.mx) if row.mx is not None else 20.0001


def reclassify_tiles(tiles: DataFrame, remap: str,
                     layer: str | None = None) -> DataFrame:
    """Standalone R1 reclassify over tile arrays (same row schema out)."""
    out_schema = tiles.schema

    def gen(batches):
        for pdf in batches:
            keep = pdf if layer is None else pdf[pdf.layer == layer]
            rows = []
            for r in keep.itertuples():
                arr = np.asarray(r.data, dtype=np.float64)
                rows.append({
                    "media_ref": r.media_ref, "layer": r.layer,
                    "tile_x": r.tile_x, "tile_y": r.tile_y,
                    "x0": r.x0, "y0": r.y0, "pixel_m": r.pixel_m,
                    "nrows": r.nrows, "ncols": r.ncols,
                    "data": kernels.reclassify_vec(arr, remap)
                    .astype(np.float32),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return tiles.mapInPandas(gen, schema=out_schema)
