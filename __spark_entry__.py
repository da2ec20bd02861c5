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
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Delegates to the SAME builder the gate query ``flagship_bal`` uses
    (balrog_spark.driver_queries.flagship_bal) so the smoke-checked entry
    point and the value-hash-checked oracle can never drift apart — the
    full per-address chain (kNN nearest vegetation + raster slope/aspect
    zonal medians + reclass + AS 3959 lookup) end-to-end
    (reference: data_prep/vegetation/xx_fiona_testing.py:88-172)."""
    from balrog_spark.driver_queries import flagship_bal

    return flagship_bal(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from balrog_spark.driver_queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted only for probabilistic
    bucketing ops, which get the driver's rows-only check)."""
    from balrog_spark.driver_queries import all_oracles
    return all_oracles()
