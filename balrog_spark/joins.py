"""Spatial joins as cell equi-joins + exact numpy refinement.

Spark has no spatial index; the reference leans on PostGIS GiST indexes and
fiona bbox masks (reference: testing/test_gdal.py:127,138,
data_prep/vegetation/xx_fiona_testing.py:133-136). The engine's substitute:

1. polygons -> grid-cell *cover* rows (cell_id, poly...) — tiny vs the point
   side, broadcast when it fits;
2. points -> cell_id via pure column arithmetic (no UDF);
3. equi-join on cell_id (hash/broadcast — Catalyst's choice, AQE-skew-safe);
4. exact geometry refinement vectorized inside one mapInPandas pass, grouping
   each Arrow batch by polygon so every ring is parsed once and tested
   against all its candidate points at once.

kNN uses iterative ring expansion with a distance lower bound
((ring-1) * cell_m) so each point stops as soon as no unexamined cell can
hold anything closer — the driver loop runs O(max_ring) Spark jobs over a
shrinking unresolved set (reference behaviour: shapely nearest_points over a
250 m fiona mask, reference: data_prep/vegetation/xx_fiona_testing.py:203-217).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from . import cells, geometry

# worker-global parsed-ring cache: candidate batches repeat the same WKT
# strings across pandas groups, so parse each polygon once per executor
_RING_CACHE: dict = {}


def _ring_of(wkt: str):
    ring = _RING_CACHE.get(wkt)
    if ring is None:
        if len(_RING_CACHE) > 50000:
            _RING_CACHE.clear()
        ring = geometry.parse_wkt(wkt)[0]
        _RING_CACHE[wkt] = ring
    return ring


_COVER = StructType([
    StructField("cell_id", LongType(), False),
    StructField("veg_id", StringType(), False),
    StructField("bal_number", LongType(), True),
    StructField("wkt", StringType(), False),
])


def with_cell(points: DataFrame, cell_m: float = cells.DEFAULT_CELL_M,
              x="x", y="y") -> DataFrame:
    """Attach the packed cell id with pure column math (stays in codegen).
    SQL twin: (floor(x/c)+524288)*1048576 + floor(y/c)+524288."""
    cx = F.floor(F.col(x) / F.lit(cell_m))
    cy = F.floor(F.col(y) / F.lit(cell_m))
    return points.withColumn(
        "cell_id", ((cx + F.lit(1 << 19)) * F.lit(1 << 20)
                    + cy + F.lit(1 << 19)).cast("long"))


def polygon_cover(polys: DataFrame, cell_m: float = cells.DEFAULT_CELL_M,
                  pad_m: float = 0.0) -> DataFrame:
    """Explode polygons to (cell_id, veg_id, bal_number, wkt) cover rows via
    bbox cover (+ optional pad for distance joins)."""

    def gen(batches):
        for pdf in batches:
            out = {"cell_id": [], "veg_id": [], "bal_number": [], "wkt": []}
            for r in pdf.itertuples():
                ring = geometry.parse_wkt(r.wkt)[0]
                xmin, ymin, xmax, ymax = geometry.bbox(ring)
                ids = cells.cover_bbox(xmin - pad_m, ymin - pad_m,
                                       xmax + pad_m, ymax + pad_m, cell_m)
                out["cell_id"].extend(int(i) for i in ids)
                out["veg_id"].extend([r.veg_id] * len(ids))
                out["bal_number"].extend(
                    [int(getattr(r, "bal_number", 0))] * len(ids))
                out["wkt"].extend([r.wkt] * len(ids))
            yield pd.DataFrame(out)

    return polys.mapInPandas(gen, schema=_COVER)


def _refine_schema(extra_cols):
    fields = [StructField("addr_id", StringType(), False),
              StructField("veg_id", StringType(), False),
              StructField("bal_number", LongType(), True)]
    for c in extra_cols:
        fields.append(StructField(c, DoubleType(), True))
    return StructType(fields)


def _spread(df: DataFrame, key: str = "addr_id") -> DataFrame:
    """Repartition the (large) probe side across the cluster. Broadcast
    joins preserve the probe side's partitioning, so a single-file parquet
    scan would otherwise serialize every downstream refine UDF."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key)


def pip_join(points: DataFrame, polys: DataFrame,
             cell_m: float = cells.DEFAULT_CELL_M,
             broadcast_cover: bool = True) -> DataFrame:
    """Point-in-polygon join (V9/J2): returns (addr_id, veg_id, bal_number)
    for every point strictly inside a polygon."""
    cover = polygon_cover(polys, cell_m)
    if broadcast_cover:
        cover = F.broadcast(cover)
    pts = _spread(with_cell(points, cell_m))
    cand = pts.join(cover, "cell_id")

    def refine(batches):
        for pdf in batches:
            keep = []
            for wkt, grp in pdf.groupby("wkt", sort=False):
                ring = _ring_of(wkt)
                inside = geometry.points_in_ring(grp.x.values, grp.y.values,
                                                 ring)
                if inside.any():
                    sub = grp[inside]
                    keep.append(pd.DataFrame({
                        "addr_id": sub.addr_id.values,
                        "veg_id": sub.veg_id.values,
                        "bal_number": sub.bal_number.values
                        .astype("int64"),
                    }))
            yield (pd.concat(keep) if keep
                   else pd.DataFrame(columns=["addr_id", "veg_id",
                                              "bal_number"]))

    return cand.mapInPandas(refine, schema=_refine_schema([]))


def dwithin_join(points: DataFrame, polys: DataFrame, radius_m: float,
                 cell_m: float = cells.DEFAULT_CELL_M) -> DataFrame:
    """Distance-within join (V10/J3): pairs with point-to-polygon distance
    <= radius (0 inside). Cover is padded by the radius so one equi-join
    suffices."""
    cover = F.broadcast(polygon_cover(polys, cell_m, pad_m=radius_m))
    pts = _spread(with_cell(points, cell_m))
    cand = pts.join(cover, "cell_id")

    def refine(batches):
        for pdf in batches:
            keep = []
            for wkt, grp in pdf.groupby("wkt", sort=False):
                ring = _ring_of(wkt)
                d, _, _ = geometry.points_to_ring_distance(
                    grp.x.values, grp.y.values, ring)
                inside = geometry.points_in_ring(grp.x.values, grp.y.values,
                                                 ring)
                d = np.where(inside, 0.0, d)
                ok = d <= radius_m
                if ok.any():
                    sub = grp[ok]
                    keep.append(pd.DataFrame({
                        "addr_id": sub.addr_id.values,
                        "veg_id": sub.veg_id.values,
                        "bal_number": sub.bal_number.values
                        .astype("int64"),
                        "distance_m": d[ok],
                    }))
            if keep:
                yield pd.concat(keep)
            else:
                yield pd.DataFrame(columns=["addr_id", "veg_id",
                                            "bal_number", "distance_m"])

    return cand.mapInPandas(refine,
                            schema=_refine_schema(["distance_m"]))


def knn_join(points: DataFrame, polys: DataFrame, max_ring: int = 8,
             cell_m: float = cells.DEFAULT_CELL_M) -> DataFrame:
    """Nearest-polygon (kNN k=1) join with bearing (V11): for each point the
    closest polygon, its exact distance (0 if inside), nearest boundary
    point, and forward azimuth — the reference's per-address
    nearest-vegetation step (reference:
    data_prep/vegetation/xx_fiona_testing.py:203-227).

    Ring-expansion: examine cover cells at Chebyshev ring r around each
    unresolved point; a point resolves once its best distance <=
    (r * cell_m), the lower bound on anything in ring > r.
    """
    spark = points.sparkSession
    cover = polygon_cover(polys, cell_m).cache()
    cover_b = F.broadcast(cover)
    pts = _spread(with_cell(points, cell_m)
                  .select("addr_id", "x", "y", "cell_id"))

    out_schema = StructType([
        StructField("addr_id", StringType(), False),
        StructField("veg_id", StringType(), False),
        StructField("bal_number", LongType(), True),
        StructField("distance_m", DoubleType(), False),
        StructField("azimuth_deg", DoubleType(), False),
        StructField("near_x", DoubleType(), False),
        StructField("near_y", DoubleType(), False),
    ])

    def best_candidates(cand: DataFrame) -> DataFrame:
        def refine(batches):
            for pdf in batches:
                keep = []
                for wkt, grp in pdf.groupby("wkt", sort=False):
                    ring = _ring_of(wkt)
                    d, nx_, ny_ = geometry.points_to_ring_distance(
                        grp.x.values, grp.y.values, ring)
                    inside = geometry.points_in_ring(
                        grp.x.values, grp.y.values, ring)
                    d = np.where(inside, 0.0, d)
                    az = geometry.azimuth_deg(grp.x.values, grp.y.values,
                                              nx_, ny_)
                    keep.append(pd.DataFrame({
                        "addr_id": grp.addr_id.values,
                        "veg_id": grp.veg_id.values,
                        "bal_number": grp.bal_number.values
                        .astype("int64"),
                        "distance_m": d, "azimuth_deg": az,
                        "near_x": nx_, "near_y": ny_,
                    }))
                if keep:
                    yield pd.concat(keep)
                else:
                    yield pd.DataFrame(columns=[f.name for f in out_schema])

        return cand.mapInPandas(refine, schema=out_schema)

    # batched ring schedule: the first round probes the whole disk out to
    # ring 2 (resolves the typical point in one job), later rounds probe
    # widening annuli; localCheckpoint truncates lineage so the iterative
    # plan can't blow up
    rounds = sorted({min(r, max_ring) for r in (2, 8, max_ring)})

    resolved_parts = []
    unresolved = pts
    best_so_far = None  # best candidate per addr so far (may not be final)
    prev = -1
    for r in rounds:
        offs = [(dx, dy) for dx in range(-r, r + 1)
                for dy in range(-r, r + 1)
                if prev < max(abs(dx), abs(dy)) <= r]
        offs_col = F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in offs])
        ring_cells = unresolved.select(
            "addr_id", "x", "y", "cell_id",
            F.explode(offs_col).alias("o")
        ).select(
            "addr_id", "x", "y",
            (F.col("cell_id") + F.col("o.dx") * F.lit(1 << 20)
             + F.col("o.dy")).alias("probe_cell"))

        cand = ring_cells.join(
            cover_b.withColumnRenamed("cell_id", "probe_cell"), "probe_cell")
        scored = best_candidates(cand)
        if best_so_far is not None:
            scored = scored.unionByName(best_so_far)
        # per-point argmin (deterministic tie-break on veg_id)
        from pyspark.sql.window import Window
        w = Window.partitionBy("addr_id").orderBy(
            F.col("distance_m").asc(), F.col("veg_id").asc())
        best = scored.withColumn("rn", F.row_number().over(w)) \
            .filter(F.col("rn") == 1).drop("rn") \
            .localCheckpoint(eager=True)

        bound = r * cell_m
        done = best.filter(F.col("distance_m") <= F.lit(bound))
        pending = best.filter(F.col("distance_m") > F.lit(bound))
        resolved_parts.append(done)
        # anti-join: drop resolved points from the frontier
        unresolved = unresolved.join(done.select("addr_id"), "addr_id",
                                     "left_anti").localCheckpoint(eager=True)
        prev = r
        if unresolved.isEmpty():
            best_so_far = None
            break
        best_so_far = pending
    if best_so_far is not None:
        # ring budget exhausted: finish the stragglers exactly with a
        # cross join against the (distinct) polygon set — by now the
        # unresolved set is tiny, so the product is bounded
        polys = cover.select("veg_id", "bal_number", "wkt").distinct() \
            .withColumn("probe_cell", F.lit(0))
        far = unresolved.withColumn("probe_cell", F.lit(0)) \
            .join(F.broadcast(polys), "probe_cell")
        scored = best_candidates(far).unionByName(best_so_far)
        from pyspark.sql.window import Window
        w = Window.partitionBy("addr_id").orderBy(
            F.col("distance_m").asc(), F.col("veg_id").asc())
        resolved_parts.append(
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))

    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out
