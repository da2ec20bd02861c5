"""Structured-Streaming ingest for the interleaved-document corpus.

The reference is a batch engine, but its operational pattern — nightly GNAF
address drops appended to the corpus (reference:
data_prep/gnaf/01_load_gnaf.sql runs per quarterly release) — maps onto a
file-source stream: new parquet files of documents arrive in a drop
directory, each micro-batch validates the span-sequence invariant
(kind, text, media_ref, offset order — BASELINE.json input_hint), derives
the typed address/vegetation side tables with the SAME pure-column parsers
the batch path uses (docparse), and appends to the corpus sink
exactly-once via the streaming checkpoint.

Everything here is the standard readStream -> transform -> writeStream
shape; the transformations are the batch operators verbatim, so streaming
coverage adds no second implementation to keep correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import docparse
from .schema import DOCUMENTS


def read_document_stream(spark: SparkSession, drop_dir: str,
                         max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of interleaved documents (explicit schema — no
    inference on a stream)."""
    return (spark.readStream
            .schema(DOCUMENTS)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(drop_dir))


def with_span_violations(docs: DataFrame) -> DataFrame:
    """Per-document span-sequence invariant check as pure columns:
    offsets strictly increasing in array order, every span carrying
    exactly one of text/media_ref for its kind. Adds ``n_violations``."""
    spans = F.col("spans")

    def empty(c):
        return c.isNull() | (c == "")

    # zip each span with its successor; the shorter side is null-padded, so
    # the predicate must coalesce (exists() over a null predicate is null,
    # which would silently drop VALID documents at the filter)
    bad_order = F.coalesce(
        F.exists(
            F.zip_with(
                spans, F.slice(spans, 2, F.greatest(F.size(spans) - 1,
                                                    F.lit(1))),
                lambda a, b: F.coalesce(
                    b.getField("offset") <= a.getField("offset"),
                    F.lit(False))),
            lambda x: x),
        F.lit(False))
    bad_payload = F.coalesce(
        F.exists(
            spans,
            lambda s: ((s.getField("kind") == "text")
                       & empty(s.getField("text")))
            | ((s.getField("kind") != "text")
               & empty(s.getField("media_ref")))),
        F.lit(False))
    return docs.withColumn(
        "n_violations",
        bad_order.cast("int") + bad_payload.cast("int"))


def start_ingest(spark: SparkSession, drop_dir: str, out_dir: str,
                 checkpoint_dir: str,
                 reject_dir: str | None = None):
    """Append-only exactly-once corpus ingest: valid documents land in
    ``out_dir`` (S8 streaming append), violations are counted out of band.
    Returns the StreamingQuery (caller awaits/stops)."""
    src = with_span_violations(read_document_stream(spark, drop_dir))
    ok = src.filter(F.col("n_violations") == 0).drop("n_violations")
    return (ok.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def streaming_address_counts(spark: SparkSession, drop_dir: str):
    """Windowless stateful demo: running address count per FDI over the
    document stream — the groupBy/agg shape Structured Streaming keeps in
    its state store; reuses the batch parser on each micro-batch."""
    docs = read_document_stream(spark, drop_dir)
    addrs = docparse.addresses_from_documents(docs)
    return addrs.groupBy("fdi").count()
