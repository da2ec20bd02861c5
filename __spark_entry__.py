"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship per-address BAL classification — the reference's
  "Auto BAL Assessment" lifecycle (buffer -> kNN nearest vegetation -> zonal
  slope/aspect medians -> AS 3959 lookup) run end-to-end over spatial inputs
  derived from the sf0.001 tables plus a deterministic synthetic DEM tile
  grid (reference: data_prep/vegetation/xx_fiona_testing.py:88-172).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 (plus the training-data pipeline ops), implemented in
  balrog_spark.driver_queries with exact DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from balrog_spark import corpus
    from balrog_spark.driver_queries import boxes_with_wkt, derived_points

    sf_dir = "/root/testdata/sf0.001"
    addrs = derived_points(spark, sf_dir).select(
        F.col("addr_id").cast("string").alias("addr_id"), "x", "y", "fdi")
    vegs = boxes_with_wkt(spark, sf_dir).select(
        F.format_string("%06d", F.col("veg_id")).alias("veg_id"),
        "bal_number", "wkt")

    # DEM tiles covering the derived world (tile = 1600 m)
    import math

    from balrog_spark.driver_queries import world_m
    n_tiles = max(math.ceil(world_m(spark, sf_dir) / corpus.TILE_M), 1)
    tiles = corpus.spark_tiles(spark, n_tiles, n_tiles,
                               layers=("dem",))

    from balrog_spark import joins, raster, zonal
    knn = joins.knn_join(addrs.select("addr_id", "x", "y"), vegs)
    sa = raster.slope_aspect_tiles(tiles, classify=False)
    pts = addrs.select("addr_id", "x", "y")
    z = zonal.zonal_stats_multi(
        pts, sa, 100.0,
        {"slope": {"circular": False}, "aspect": {"circular": True}}) \
        .select("addr_id",
                F.col("slope_med").alias("slope_med_deg"),
                F.col("aspect_med").alias("aspect_med_deg"))

    from balrog_spark.constants import ASPECT_REMAP, slope_remap
    from balrog_spark.pipeline import (classify_bal, direction_class,
                                       remap_column)
    f = addrs.join(knn, "addr_id").join(z, "addr_id", "left")
    f = (f.withColumn(
            "slope_class",
            F.when(F.col("slope_med_deg").isNull()
                   | (F.col("slope_med_deg") == -9999), F.lit(-99))
            .otherwise(remap_column(F.col("slope_med_deg").cast("double"),
                                    slope_remap(90.0))))
         .withColumn(
            "aspect_class",
            F.when(F.col("aspect_med_deg").isNull()
                   | (F.col("aspect_med_deg") == -9999), F.lit(-99))
            .otherwise(remap_column(F.col("aspect_med_deg").cast("double"),
                                    ASPECT_REMAP)))
         .withColumn("dir_class", direction_class(F.col("azimuth_deg"))))
    f = f.withColumn(
        "eff_slope_code",
        F.when(F.col("slope_class") == -99, F.lit(-99))
        .when(F.col("aspect_class") == F.col("dir_class"),
              F.col("slope_class"))
        .otherwise(F.lit(-1)))
    out = classify_bal(f.withColumn("veg_code",
                                    F.col("bal_number").cast("long")),
                       spark, fdi_col="fdi", slope_col="eff_slope_code",
                       veg_col="veg_code", dist_col="distance_m")
    return out.select(
        F.col("addr_id").cast("long").alias("addr_id"), "fdi",
        F.col("veg_id").cast("long").alias("veg_id"),
        F.col("bal_number").cast("long").alias("bal_number"),
        F.round("distance_m", 4).alias("distance_m"),
        F.round("azimuth_deg", 4).alias("azimuth_deg"),
        "slope_class", "aspect_class", "dir_class", "eff_slope_code",
        F.col("bal").cast("double").alias("bal"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from balrog_spark.driver_queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted only for probabilistic
    bucketing ops, which get the driver's rows-only check)."""
    from balrog_spark.driver_queries import all_oracles
    return all_oracles()
