"""Bucketed-table co-located join: at 100 TB the win is writing both join
sides bucketed by the join key so the join needs NO shuffle exchange at
read time. Asserted at the PLAN level (no Exchange feeding the SortMerge
join) and at the result level (equals the plain shuffled join)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_tables(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 97).alias("a"))
    right = spark.range(0, 5000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("b"))
    for name, df in (("t_left", left), ("t_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(8, "k").sortBy("k").saveAsTable(name)
    yield "t_left", "t_right"
    for name in ("t_left", "t_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    ln, rn = warehouse_tables
    joined = spark.table(ln).join(spark.table(rn), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: both sides read pre-bucketed, the join has no Exchange
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # and an UNBUCKETED twin of the same join DOES shuffle (the assertion
    # above is meaningful)
    plain = (spark.table(ln).repartition(8)
             .join(spark.table(rn).repartition(8), "k"))
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan

    got = sorted(tuple(r) for r in joined.collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want and len(got) == 1667  # ceil(5000/3) keys match
