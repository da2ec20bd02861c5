"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Headline set: the flagship per-address BAL pipeline plus the operators that
dominate the engine's cost model (raster scan, spatial joins, zonal stats,
dedup, ANN). Execution is forced with the noop sink (no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "r1_reclassify", "r9_bal_esti", "w4_directional_scan",
    "r4_slope_aspect_tiled", "a1_zonal_stats", "a2_circular_stats",
    "v9_pip_join", "v10_dwithin_join", "v11_knn", "v8_subdivide",
    "v6_dissolve_union", "j1_equi_join", "dedup_exact",
    "dedup_minhash_lsh", "dedup_substring_runs", "dedup_remove_spans",
    "dedup_incremental", "flagship_curation",
    "ann_cosine_topk", "text_quality",
    "r14_polygonize",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from balrog_spark import corpus, raster
    from balrog_spark.driver_queries import all_queries
    from balrog_spark.session import get_spark

    spark = get_spark(app="balrog-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    timings = {}

    # session warm-up (NOT an operator warm-up: each query below still
    # compiles and runs its own plan cold): first-ever codegen + noop-sink
    # + python-worker spin-up otherwise bills ~4 s to whichever query runs
    # first
    spark.read.parquet(f"{sf_dir}/region.parquet") \
        .write.format("noop").mode("overwrite").save()
    # spin up the Arrow python workers too (a long-lived cluster session
    # amortizes daemon startup; without this the first UDF-bearing query
    # below is billed ~2 s of worker fork instead of its own plan)
    spark.range(64).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long") \
        .write.format("noop").mode("overwrite").save()

    t_all0 = time.time()

    for name in HEADLINE:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # kNN with the cover shuffle-joined instead of broadcast (the
    # 9.4M-polygon scale path) — must stay within ~2x of v11_knn
    from pyspark.sql import functions as F

    from balrog_spark import joins
    from balrog_spark.driver_queries import boxes_with_wkt, derived_points
    t0 = time.time()
    p = derived_points(spark, sf_dir).select(
        F.col("addr_id").cast("string").alias("addr_id"), "x", "y")
    b = boxes_with_wkt(spark, sf_dir).select(
        F.format_string("%06d", F.col("veg_id")).alias("veg_id"),
        "bal_number", "wkt")
    joins.knn_join(p, b, max_ring=16, broadcast_cover=False) \
        .write.format("noop").mode("overwrite").save()
    timings["v11_knn_shuffle_cover"] = round(time.time() - t0, 3)

    # flagship: per-address BAL over the derived world + document count rate
    import __spark_entry__ as entrymod
    t0 = time.time()
    flag = entrymod.entry(spark)
    n_addr = flag.count()
    timings["flagship_bal"] = round(time.time() - t0, 3)

    # the round-4 all-intersecting-polygons fan-out (one row per
    # buffer∩polygon with clip + per-clip zonal medians) at the bench SF
    t0 = time.time()
    queries["flagship_veg_factors"](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()
    timings["flagship_veg_factors"] = round(time.time() - t0, 3)

    # raster throughput: the full tiled Gen-1 BAL pipeline on a synthetic
    # 8x8-tile AOI (64x64 px tiles)
    tiles = corpus.spark_tiles(spark, 8, 8).cache()
    tiles.count()
    t0 = time.time()
    raster.bal_tiles(tiles, fdi=80).write.format("noop") \
        .mode("overwrite").save()
    timings["tile_bal_8x8"] = round(time.time() - t0, 3)

    total = round(time.time() - t_all0, 3)
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship_rows": n_addr,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
