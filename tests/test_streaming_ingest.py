"""Structured-Streaming ingest: exactly-once append, invariant filter,
stateful aggregation — all reusing the batch parsers."""

from pyspark.sql import functions as F

from balrog_spark import corpus, docparse, streaming


def _write_drop(spark, drop_dir, nx, ny, fname):
    docs = corpus.spark_documents(spark, nx, ny)
    docs.coalesce(1).write.mode("append").parquet(drop_dir)
    return docs.count()


def test_streaming_ingest_exactly_once(spark, tmp_path):
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n1 = _write_drop(spark, drop, 1, 1, "a")

    q = streaming.start_ingest(spark, drop, out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out)
    assert got1.count() == n1

    # second drop: only the NEW files are processed (checkpoint), and a
    # restart with no new data appends nothing
    n2 = _write_drop(spark, drop, 2, 2, "b")
    q = streaming.start_ingest(spark, drop, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1 + n2
    q = streaming.start_ingest(spark, drop, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1 + n2

    # span-sequence invariant survives the streaming hop (per-row check —
    # doc_ids repeat across the two deterministic drops)
    v = streaming.with_span_violations(spark.read.parquet(out))
    assert v.filter(F.col("n_violations") > 0).count() == 0


def test_streaming_violation_filter(spark, tmp_path):
    import pandas as pd
    drop = str(tmp_path / "drop2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    good = {"doc_id": "g", "spans": [
        {"kind": "text", "text": "ADDR|1|2|3|50", "media_ref": "",
         "offset": 0},
        {"kind": "media_ref", "text": "", "media_ref": "dem/0/0",
         "offset": 13}]}
    bad_order = {"doc_id": "b1", "spans": [
        {"kind": "text", "text": "x", "media_ref": "", "offset": 5},
        {"kind": "text", "text": "y", "media_ref": "", "offset": 2}]}
    bad_payload = {"doc_id": "b2", "spans": [
        {"kind": "media_ref", "text": "", "media_ref": "", "offset": 0}]}
    df = spark.createDataFrame([good, bad_order, bad_payload],
                               schema=streaming.DOCUMENTS)
    df.coalesce(1).write.mode("append").parquet(drop)
    q = streaming.start_ingest(spark, drop, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert [r.doc_id for r in got.collect()] == ["g"]


def test_streaming_stateful_counts_match_batch(spark, tmp_path):
    drop = str(tmp_path / "drop3")
    _write_drop(spark, drop, 2, 2, "a")
    stream = streaming.streaming_address_counts(spark, drop)
    q = (stream.writeStream.format("memory").queryName("fdi_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.fdi: r["count"] for r in
           spark.sql("SELECT * FROM fdi_counts").collect()}
    batch = {r.fdi: r["count"] for r in
             docparse.addresses_from_documents(
                 spark.read.parquet(drop)).groupBy("fdi").count()
             .collect()}
    assert got == batch


def _text_doc(doc_id, *texts):
    off, spans = 0, []
    for t in texts:
        spans.append({"kind": "text", "text": t, "media_ref": "",
                      "offset": off})
        off += len(t) + 1
    return {"doc_id": doc_id, "spans": spans}


def test_streaming_incremental_dedup(spark, tmp_path):
    """The crawl-ingest loop end-to-end: three micro-batches dedup
    against the accumulating signature store; flags land exactly-once;
    a full replay after checkpoint loss changes nothing (both tables
    are stage-idempotent by batch id); time travel on the sig table
    shows the dedup frontier as of each batch."""
    import time

    from balrog_spark import snapshots

    drop = str(tmp_path / "drop4")
    sig = str(tmp_path / "sigtable")
    flags = str(tmp_path / "flagstable")
    ckpt = str(tmp_path / "ckpt4")

    t1 = ("the first unique document body with plenty of shingle "
          "material spread over", "two separate text spans")
    t2 = ("a second entirely different document about raster tiles "
          "and zonal medians in the engine",)
    t4 = ("fourth doc with its own distinct content concerning "
          "minhash signatures and band keys",)
    batches = [
        [_text_doc("d01", *t1), _text_doc("d02", *t2)],
        [_text_doc("d03", *t1),                     # dup of stored d01
         _text_doc("d04", *t4),
         _text_doc("d05", *t4)],                    # in-batch dup of d04
        [_text_doc("d06", *t2)],                    # dup of stored d02
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema=streaming.DOCUMENTS) \
            .coalesce(1).write.mode("append").parquet(drop)
        time.sleep(1.1)   # distinct mtimes -> deterministic batch order

    q = streaming.start_dedup_ingest(spark, drop, sig, flags, ckpt)
    q.awaitTermination(120)

    got = {r.doc_id: r.dup_of for r in
           snapshots.read_table(spark, flags).collect()}
    assert got == {"d03": "d01", "d05": "d04", "d06": "d02"}
    assert snapshots.read_table(spark, sig).count() == 6
    stages = [rec["stage"] for rec in snapshots.history(sig)]
    assert stages == [f"dedup-batch-{i}" for i in range(3)]
    # time travel: the frontier as of batch 0 holds only batch 0's sigs
    first = snapshots.history(sig)[0]["snapshot_id"]
    assert snapshots.read_table(spark, sig, as_of=first).count() == 2

    # checkpoint loss: a fresh checkpoint replays every file with the
    # same batch ids -> both tables stage-skip, nothing changes
    q = streaming.start_dedup_ingest(spark, drop, sig, flags,
                                     str(tmp_path / "ckpt4b"))
    q.awaitTermination(120)
    got2 = {r.doc_id: r.dup_of for r in
            snapshots.read_table(spark, flags).collect()}
    assert got2 == got
    assert snapshots.read_table(spark, sig).count() == 6


def test_replay_after_expiry_does_not_double_append(spark, tmp_path):
    """expire_snapshots truncates the version log, but the stage ledger
    keeps the committed batch ids: a full replay (fresh checkpoint)
    after compaction+expiry must not double-append."""
    from balrog_spark import snapshots

    drop = str(tmp_path / "drop5")
    table = str(tmp_path / "table5")
    n1 = _write_drop(spark, drop, 1, 1, "a")
    q = streaming.start_snapshot_ingest(spark, drop, table,
                                        str(tmp_path / "ck5"))
    q.awaitTermination(120)
    assert snapshots.read_table(spark, table).count() == n1

    snapshots.compact(spark, table)
    assert snapshots.expire_snapshots(table, keep_last=1) != []
    assert snapshots.stage_committed(table, "stream-batch-0")

    # checkpoint loss: every file replays with its original batch id
    q = streaming.start_snapshot_ingest(spark, drop, table,
                                        str(tmp_path / "ck5b"))
    q.awaitTermination(120)
    assert snapshots.read_table(spark, table).count() == n1


def test_reject_dir_preserves_violations(spark, tmp_path):
    import pandas as pd  # noqa: F401
    drop = str(tmp_path / "drop6")
    out = str(tmp_path / "out6")
    rej = str(tmp_path / "rej6")
    good = {"doc_id": "g", "spans": [
        {"kind": "text", "text": "hello", "media_ref": "", "offset": 0}]}
    bad = {"doc_id": "b", "spans": [
        {"kind": "media_ref", "text": "", "media_ref": "", "offset": 0}]}
    spark.createDataFrame([good, bad], schema=streaming.DOCUMENTS) \
        .coalesce(1).write.mode("append").parquet(drop)
    q = streaming.start_ingest(spark, drop, out, str(tmp_path / "ck6"),
                               reject_dir=rej)
    q.awaitTermination(120)
    q._reject_query.awaitTermination(120)
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == ["g"]
    rejected = spark.read.parquet(rej).toPandas()
    assert list(rejected.doc_id) == ["b"]
    assert int(rejected.n_violations.iloc[0]) >= 1
