"""Event-time Structured Streaming: watermarked tumbling-window aggregation
(late data dropped, windows emitted exactly once) and the
applyInPandasWithState cross-batch streaming dedup operator (state survives
query restarts via the checkpoint)."""

import datetime as dt

from balrog_spark import streaming


def _doc(doc_id, ts, n_text=0, n_media=0):
    spans, off = [], 0
    for i in range(n_text):
        spans.append({"kind": "text", "text": f"t{i}", "media_ref": "",
                      "offset": off})
        off += 5
    for i in range(n_media):
        spans.append({"kind": "media_ref", "text": "",
                      "media_ref": f"dem/{i}/0", "offset": off})
        off += 5
    return {"doc_id": doc_id, "spans": spans,
            "event_ts": dt.datetime(2026, 3, 1, ts // 100, ts % 100)}


def _drop(spark, drop_dir, docs):
    df = spark.createDataFrame(docs, schema=streaming.TIMED_DOCUMENTS)
    df.coalesce(1).write.mode("append").parquet(drop_dir)


def test_watermark_drops_late_and_emits_windows_once(spark, tmp_path):
    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: watermark after it = 10:40 - 15min = 10:25
    _drop(spark, drop, [_doc("d1", 1005, n_text=2, n_media=1),
                        _doc("d2", 1005, n_text=1),
                        _doc("d3", 1040, n_text=1)])
    # batch 2 runs with watermark 10:25 >= window end 10:10, so the
    # [10:00,10:10) window is EMITTED and its state evicted at this batch;
    # d5 advances the watermark to 10:45
    _drop(spark, drop, [_doc("d5", 1100, n_media=1)])
    # batch 3: d4 is LATE — its window is already finalized and below the
    # in-effect watermark, so Spark's exactly-once append contract requires
    # the row be dropped (a row arriving while its window state is still
    # live is only best-effort dropped, which is why this arrives a batch
    # AFTER the eviction); d6 advances the watermark to 11:15
    _drop(spark, drop, [_doc("d4", 1006, n_text=5),
                        _doc("d6", 1130, n_text=1)])

    agg = streaming.windowed_span_counts(
        streaming.read_timed_document_stream(spark, drop,
                                             max_files_per_trigger=1))
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = sorted((r.win_start.strftime("%H:%M"), r.kind, r.n_spans)
                 for r in spark.sql("SELECT * FROM win_counts").collect())
    # exactly one row per closed window+kind: the late doc's 5 text spans
    # are neither merged into the emitted [10:00,10:10) row (would read 8)
    # nor re-opened as a duplicate row; d6's own window (end 11:40 > final
    # watermark 11:15) has not emitted
    assert got == [
        ("10:00", "media_ref", 1), ("10:00", "text", 3),
        ("10:40", "text", 1),
        ("11:00", "media_ref", 1),
    ]


def test_dedup_stream_across_batches_and_restart(spark, tmp_path):
    drop = str(tmp_path / "drop2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    # A duplicated within batch 1; B and A repeat across later batches
    _drop(spark, drop, [_doc("A", 1000), _doc("A", 1001), _doc("B", 1002)])
    _drop(spark, drop, [_doc("B", 1010), _doc("C", 1011)])
    _drop(spark, drop, [_doc("A", 1020), _doc("D", 1021)])

    def run():
        src = streaming.read_timed_document_stream(spark, drop,
                                                   max_files_per_trigger=1)
        q = (streaming.dedup_stream(src, n_shards=8).writeStream
             .format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    run()
    emitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert emitted == ["A", "B", "C", "D"]

    # restart with a new drop: the seen-set lives in the state store, so a
    # re-seen id stays suppressed across query restarts
    _drop(spark, drop, [_doc("A", 1030), _doc("E", 1031)])
    run()
    emitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert emitted == ["A", "B", "C", "D", "E"]


def test_snapshot_ingest_exactly_once_and_time_travel(spark, tmp_path):
    """foreachBatch -> snapshot commits: one snapshot per micro-batch with
    batch metrics, exactly-once across checkpoint loss (replayed batch ids
    are skipped), and time travel shows the corpus as of each batch."""
    import shutil

    from balrog_spark import corpus, snapshots

    drop = str(tmp_path / "drop3")
    table = str(tmp_path / "table3")
    ckpt = str(tmp_path / "ckpt3")

    d1 = corpus.spark_documents(spark, 1, 1)
    d1.coalesce(1).write.mode("append").parquet(drop)
    n1 = d1.count()
    q = streaming.start_snapshot_ingest(spark, drop, table, ckpt)
    q.awaitTermination(180)
    assert snapshots.read_table(spark, table).count() == n1
    h = snapshots.history(table)
    assert [r["stage"] for r in h] == ["stream-batch-0"]
    assert h[0]["metrics"]["rows_written"] == n1

    # second drop appends batch 1; table = both, snapshot 1 = first only
    d2 = corpus.spark_documents(spark, 2, 2)
    d2.coalesce(1).write.mode("append").parquet(drop)
    n2 = d2.count()
    q = streaming.start_snapshot_ingest(spark, drop, table, ckpt)
    q.awaitTermination(180)
    assert snapshots.read_table(spark, table).count() == n1 + n2
    assert snapshots.read_table(spark, table, as_of=1).count() == n1

    # checkpoint loss: Structured Streaming replays EVERYTHING from batch
    # 0 — the batch-id ledger must swallow the replay without duplicating
    shutil.rmtree(ckpt)
    q = streaming.start_snapshot_ingest(spark, drop, table, ckpt)
    q.awaitTermination(180)
    assert snapshots.read_table(spark, table).count() == n1 + n2
    assert len(snapshots.history(table)) == 2
