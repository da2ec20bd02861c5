"""The r6 knn_join rewrite added a direct (cover-less partial-top-k)
mode chosen by a pair budget, alongside the scheduled-ring and
ring-doubling + straggler-finish paths. All modes must produce
identical rows — the mode cutover is a pure performance decision, so a
scale change (which flips the budget) must never change results."""

import pytest
from pyspark.sql import functions as F

from balrog_spark import joins


@pytest.fixture(scope="module")
def world(spark):
    pts = spark.range(1, 301).selectExpr(
        "CAST(id AS STRING) AS addr_id",
        "CAST((id * 2654435761) % 4000 AS DOUBLE) + 0.125 AS x",
        "CAST((id * 2246822519) % 4000 AS DOUBLE) + 0.625 AS y")
    boxes = spark.range(1, 41).selectExpr(
        "format_string('%06d', id) AS veg_id",
        "CAST((id * 3266489917) % 4000 AS DOUBLE) + 0.5 AS cx",
        "CAST((id * 668265263) % 4000 AS DOUBLE) + 0.5 AS cy",
        "CAST(30 + (id % 7) * 25 AS DOUBLE) + 0.25 AS hw",
        "CAST(30 + (id % 5) * 30 AS DOUBLE) + 0.25 AS hh",
        "CAST(id % 7 + 1 AS BIGINT) AS bal_number")
    polys = boxes.withColumn(
        "wkt",
        F.format_string(
            "POLYGON ((%.2f %.2f, %.2f %.2f, %.2f %.2f, %.2f %.2f, "
            "%.2f %.2f))",
            F.col("cx") - F.col("hw"), F.col("cy") - F.col("hh"),
            F.col("cx") + F.col("hw"), F.col("cy") - F.col("hh"),
            F.col("cx") + F.col("hw"), F.col("cy") + F.col("hh"),
            F.col("cx") - F.col("hw"), F.col("cy") + F.col("hh"),
            F.col("cx") - F.col("hw"), F.col("cy") - F.col("hh"))) \
        .select("veg_id", "bal_number", "wkt")
    return pts, polys


def _canon(df, k):
    cols = ["addr_id", "veg_id",
            F.round("distance_m", 6).alias("d"),
            F.round("near_x", 6).alias("nx"),
            F.round("near_y", 6).alias("ny"),
            F.round("azimuth_deg", 6).alias("az"), "line_wkt"]
    if k > 1:
        cols.append("nn_rank")
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("k", [1, 3])
def test_knn_modes_identical(world, k, monkeypatch):
    pts, polys = world
    # direct mode (defaults pass the budget at this size)
    direct = _canon(joins.knn_join(pts, polys, max_ring=8, k=k), k)
    assert len(direct) == 300 * k

    # scheduled-ring path: fail the pre-round budget
    monkeypatch.setattr(joins, "DIRECT_PAIR_BUDGET", 1)
    ring = _canon(joins.knn_join(pts, polys, max_ring=8, k=k), k)
    assert ring == direct

    # ring-doubling + partial-top-k straggler finish: tiny max_ring and
    # a frontier cap below the point count force the post-loop paths
    monkeypatch.setattr(joins, "DIRECT_PAIR_BUDGET", 10**4)
    monkeypatch.setattr(joins, "STRAGGLER_DIRECT_MAX", 50)
    doubling = _canon(joins.knn_join(pts, polys, max_ring=1, k=k), k)
    assert doubling == direct
