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
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

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
    ``out_dir`` (S8 streaming append). With ``reject_dir`` set, the
    violating documents land there too (n_violations column kept for
    triage) via a SECOND file-sink query with its own checkpoint — the
    parquet streaming sink's transaction log keeps BOTH paths
    exactly-once, so a bad drop is preserved and countable instead of
    silently vanishing. Returns the main StreamingQuery; the reject
    query rides along as ``._reject_query`` (awaited/stopped with the
    same calls the caller makes on the main one)."""
    src = with_span_violations(read_document_stream(spark, drop_dir))
    ok = src.filter(F.col("n_violations") == 0).drop("n_violations")
    q = (ok.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    if reject_dir is not None:
        bad = with_span_violations(read_document_stream(spark, drop_dir)) \
            .filter(F.col("n_violations") > 0)
        q._reject_query = (bad.writeStream
                           .format("parquet")
                           .option("path", reject_dir)
                           .option("checkpointLocation",
                                   checkpoint_dir + "-rejects")
                           .outputMode("append")
                           .trigger(availableNow=True)
                           .start())
    return q


def streaming_address_counts(spark: SparkSession, drop_dir: str):
    """Windowless stateful demo: running address count per FDI over the
    document stream — the groupBy/agg shape Structured Streaming keeps in
    its state store; reuses the batch parser on each micro-batch."""
    docs = read_document_stream(spark, drop_dir)
    addrs = docparse.addresses_from_documents(docs)
    return addrs.groupBy("fdi").count()


def start_snapshot_ingest(spark: SparkSession, drop_dir: str,
                          table_dir: str, checkpoint_dir: str):
    """Stream -> versioned-table sink: each micro-batch of valid documents
    commits ONE snapshot (metrics carry the batch id and row count) — the
    canonical foreachBatch + idempotent-commit pattern for exactly-once
    streaming writes into an Iceberg-style table. Idempotence is by batch
    id: a batch replayed after a checkpoint rollback or crash finds its
    snapshot already committed and skips, so the table never double-counts
    (Structured Streaming guarantees replays keep their batch id). History
    doubles as the ingest ledger: time travel to snapshot N shows the
    corpus exactly as of batch N."""
    from . import snapshots

    src = with_span_violations(read_document_stream(spark, drop_dir))
    ok = src.filter(F.col("n_violations") == 0).drop("n_violations")

    def commit(batch_df, batch_id: int):
        stage = f"stream-batch-{batch_id}"
        # stage_committed, not a history() scan: it survives
        # expire_snapshots (expiry folds stages into the ledger) and
        # short-circuits newest-first (replays probe the latest batch)
        if snapshots.stage_committed(table_dir, stage):
            return                     # replayed batch: already committed
        # rows_written is derived inside commit_append from the files on
        # disk — the batch plan executes exactly once (the write)
        snapshots.commit_append(batch_df, table_dir, stage=stage,
                                metrics={"batch_id": int(batch_id)})

    return (ok.writeStream.foreachBatch(commit)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def doc_text(docs: DataFrame) -> DataFrame:
    """(doc_id, text): the document's text spans concatenated in span
    order — the canonical text view the dedup family operates on."""
    txt = F.concat_ws(
        " ", F.transform(
            F.filter("spans", lambda s: s.getField("kind") == "text"),
            lambda s: s.getField("text")))
    return docs.select("doc_id", txt.alias("text"))


def start_dedup_ingest(spark: SparkSession, drop_dir: str,
                       sig_table: str, flags_table: str,
                       checkpoint_dir: str,
                       max_files_per_trigger: int = 1):
    """Streaming INCREMENTAL dedup — the 10^12-doc crawl-ingest loop:
    each micro-batch of documents dedups against the signature store
    accumulated by every batch before it (plus earlier-id docs of the
    same batch), appends its flags to ``flags_table`` and its own
    signatures to ``sig_table``, exactly-once.

    The store is a versioned snapshot table of
    :func:`textops.minhash_signatures` rows — a pure function of the
    text, so the stored corpus is never re-read or re-shuffled: only
    the batch's band rows move (broadcast against the store). Both
    commits are idempotent by batch id with the sig-table commit LAST:
    a replay after checkpoint loss finds the sig stage and skips
    everything; a crash between the two commits replays into a flags
    stage-skip + sig commit. Time travel on ``sig_table`` shows the
    dedup frontier exactly as of any batch."""
    from . import snapshots, textops

    src = with_span_violations(
        read_document_stream(spark, drop_dir, max_files_per_trigger))
    ok = src.filter(F.col("n_violations") == 0).drop("n_violations")

    def commit(batch_df, batch_id: int):
        stage = f"dedup-batch-{batch_id}"
        # stage_committed survives expire_snapshots via the ledger and
        # short-circuits newest-first on the retained log
        if snapshots.stage_committed(sig_table, stage):
            return                     # replayed batch: fully committed
        texts = doc_text(batch_df)
        new_sigs = textops.minhash_signatures(texts) \
            .localCheckpoint(eager=True)   # consumed by flags AND append
        has_store = snapshots.current_snapshot_id(sig_table) is not None
        sigs = (snapshots.read_table(spark, sig_table) if has_store
                else new_sigs.limit(0))
        flags = textops.dedup_incremental(texts, sigs, new_sigs=new_sigs)
        if not snapshots.stage_committed(flags_table, stage):
            snapshots.commit_append(flags, flags_table, stage=stage,
                                    metrics={"batch_id": int(batch_id)})
        snapshots.commit_append(new_sigs, sig_table, stage=stage,
                                metrics={"batch_id": int(batch_id)})

    return (ok.writeStream.foreachBatch(commit)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


# ---------------------------------------------------------------------------
# event-time processing: a nightly/quarterly drop carries a release
# timestamp per document; TIMED_DOCUMENTS is DOCUMENTS + that event time
TIMED_DOCUMENTS = StructType(
    list(DOCUMENTS.fields) + [StructField("event_ts", TimestampType(),
                                          False)])


def read_timed_document_stream(spark: SparkSession, drop_dir: str,
                               max_files_per_trigger: int = 1) -> DataFrame:
    return (spark.readStream
            .schema(TIMED_DOCUMENTS)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(drop_dir))


def windowed_span_counts(docs: DataFrame, window: str = "10 minutes",
                         watermark: str = "15 minutes") -> DataFrame:
    """Tumbling event-time window of span counts per kind with a watermark.
    In append output mode a window emits exactly once, when the watermark
    (max seen event time minus ``watermark``) passes its end; its state is
    then evicted, so the operator runs indefinitely in bounded memory. A
    late row whose window has been finalized is guaranteed dropped — it can
    never re-open or duplicate an emitted window; a late-but-not-yet-
    finalized row may still merge (Spark's documented best-effort bound)."""
    return (docs
            .withWatermark("event_ts", watermark)
            .select("event_ts", F.explode("spans").alias("s"))
            .groupBy(F.window("event_ts", window).alias("w"),
                     F.col("s.kind").alias("kind"))
            .agg(F.count("*").alias("n_spans"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"), "kind", "n_spans"))


_DEDUP_OUT = StructType([
    StructField("doc_id", StringType(), False),
    StructField("event_ts", TimestampType(), False),
    StructField("n_spans", IntegerType(), False),
])
_DEDUP_STATE = StructType([
    StructField("seen", ArrayType(LongType()), True),
])


def dedup_stream(docs: DataFrame, n_shards: int = 64) -> DataFrame:
    """Cross-micro-batch streaming EXACT dedup — the training-data-pipeline
    dedup operator in its streaming form, as an applyInPandasWithState
    custom stateful operator: each shard (pmod(xxhash64(doc_id), n_shards))
    keeps the set of doc-id hashes it has ever emitted in the state store
    and emits only first occurrences, within and across batches. Sharding
    distributes state across executors exactly like the batch dedup's hash
    aggregate distributes its groups; a 64-bit hash stands in for the id
    (collision odds are the same birthday bound the batch MinHash pipeline
    already accepts)."""

    def emit_new(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            first = pdf[~pdf.doc_h.duplicated()]
            new = first[~first.doc_h.isin(seen)]
            if len(new):
                seen.update(int(h) for h in new.doc_h)
                yield new[["doc_id", "event_ts", "n_spans"]]
        state.update((sorted(seen),))

    keyed = docs.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).alias("shard"),
        F.xxhash64("doc_id").alias("doc_h"),
        "doc_id", "event_ts",
        F.size("spans").cast("int").alias("n_spans"))
    return keyed.groupBy("shard").applyInPandasWithState(
        emit_new, _DEDUP_OUT, _DEDUP_STATE, "append",
        GroupStateTimeout.NoTimeout)


# ---------------------------------------------------------------------------
# raster granule ingest: new COG granules land in a drop directory (the
# write_geotiff_granules layout, <layer>_<gx>_<gy>.tif) and stream into
# the versioned tile table with the same batch-id idempotence as the
# document path — S8 append ingest extended to the raster store

def read_granule_stream(spark: SparkSession, drop_dir: str,
                        max_files_per_trigger: int = 4,
                        level: int = 0) -> DataFrame:
    """binaryFile stream over a granule directory -> engine TILES rows.
    Each micro-batch row carries one whole granule's bytes (granule size
    is bounded by the sink's granule_tiles, so content fits an executor
    row); decode runs executor-side in one mapInPandas with the shared
    numpy codec. Layer name comes from the sink's filename convention."""
    from .geotiff import granule_tiles_pdf
    from .schema import TILES

    src = (spark.readStream.format("binaryFile")
           .schema("path STRING, modificationTime TIMESTAMP, "
                   "length LONG, content BINARY")
           .option("pathGlobFilter", "*.tif")
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .load(drop_dir)
           .select("path", "content"))

    def decode(batches):
        import os

        for pdf in batches:
            for r in pdf.itertuples():
                name = os.path.basename(r.path)
                layer = name[:-4].rsplit("_", 2)[0]
                yield granule_tiles_pdf(bytes(r.content), layer,
                                        f"granule:{name}", level=level)

    return src.mapInPandas(decode, schema=TILES)


def start_granule_snapshot_ingest(spark: SparkSession, drop_dir: str,
                                  table_dir: str, checkpoint_dir: str,
                                  max_files_per_trigger: int = 4):
    """Granule stream -> versioned tile table, exactly-once: one snapshot
    per micro-batch, replayed batch ids skipped via the history ledger
    (identical contract to start_snapshot_ingest for documents)."""
    from . import snapshots

    tiles = read_granule_stream(spark, drop_dir,
                                max_files_per_trigger=max_files_per_trigger)

    def commit(batch_df, batch_id: int):
        stage = f"granule-batch-{batch_id}"
        if snapshots.stage_committed(table_dir, stage):
            return                     # replayed batch: already committed
        snapshots.commit_append(batch_df, table_dir, stage=stage,
                                metrics={"batch_id": int(batch_id)})

    return (tiles.writeStream.foreachBatch(commit)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
