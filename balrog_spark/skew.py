"""Hot-key detection and salting — explicit skew control.

The reference's vegetation classes are 47:1 skewed (woodland 3.2M polygons
vs scrub 68k, reference: data_prep/vegetation/xx_testing.sql:114-125) and its
per-class process fan-out (reference:
data_prep/vegetation/04_merge_geometries.py:79-84) suffers exactly that
imbalance. AQE's skew-join splitting only helps sort-merge joins, not UDF
groupBys — so the engine salts explicitly:

1. a cheap pre-pass counts rows per key (sampled at scale);
2. keys above the threshold get a salt in [0, n_salt) so their groups split
   across executors;
3. a partial aggregate runs per (key, salt), then a final merge per key —
   the same two-pass shape the reference hand-rolls with chunked
   unary_union (reference: 04_merge_geometries.py:148-177).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key_cols, threshold: int,
             sample_fraction: float | None = None) -> DataFrame:
    """Keys whose row count exceeds ``threshold``. At 100 TB run this on a
    sample (count scales by 1/fraction)."""
    src = df.sample(sample_fraction) if sample_fraction else df
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    return (src.groupBy(*key_cols)
            .agg((F.count("*") * F.lit(scale)).alias("n"))
            .filter(F.col("n") > threshold)
            .select(*key_cols))


def with_salt(df: DataFrame, key_cols, hot: DataFrame, n_salt: int,
              salt_col: str = "salt") -> DataFrame:
    """Attach a salt column: 0 for cold keys, spread over [0, n_salt) for
    hot keys. The salt mixes a value hash with the source partition id and
    the in-partition position, so even rows identical on EVERY column (the
    classic hot-duplicate case) still spread across salts — a pure value
    hash would pin them all to one."""
    hot_marked = F.broadcast(hot.withColumn("_hot", F.lit(True)))
    j = df.withColumn("_rowpos", F.monotonically_increasing_id()) \
        .join(hot_marked, list(key_cols), "left")
    salt = F.when(F.col("_hot").isNotNull(),
                  F.pmod(F.hash(*df.columns, F.col("_rowpos")),
                         F.lit(n_salt))) \
        .otherwise(F.lit(0))
    return j.withColumn(salt_col, salt.cast("int")) \
        .drop("_hot", "_rowpos")


def salted_aggregate(df: DataFrame, key_cols, partial_aggs: dict,
                     final_aggs: dict, threshold: int = 1_000_000,
                     n_salt: int = 16) -> DataFrame:
    """Generic two-level aggregate with hot-key salting.

    ``partial_aggs``: {out_name: Column} computed per (key, salt);
    ``final_aggs``: {out_name: Column over the partial names} merging salted
    partials per key. For algebraic aggregates (count/sum/min/max) the
    result is identical to a direct groupBy (asserted in tests).
    """
    hot = hot_keys(df, key_cols, threshold)
    salted = with_salt(df, key_cols, hot, n_salt)
    partial = salted.groupBy(*key_cols, "salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()])
    return partial.groupBy(*key_cols).agg(
        *[c.alias(n) for n, c in final_aggs.items()])
