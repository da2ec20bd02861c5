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
