"""Iceberg-pattern snapshot log: time travel, rollback, schema evolution,
atomic commits, expiry, and the lineage-into-snapshots resume contract."""

import os

import pytest

from balrog_spark import snapshots as S


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, vals, cols=("k", "v")):
    return spark.createDataFrame([tuple(v) for v in vals], list(cols))


def test_append_time_travel_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = S.commit_append(_mk(spark, [(1, 10), (2, 20)]), t, stage="load",
                         metrics={"rows": 2})
    s2 = S.commit_append(_mk(spark, [(3, 30)]), t, stage="load")
    s3 = S.commit_append(_mk(spark, [(4, 40)]), t, stage="load")
    assert (s1, s2, s3) == (1, 2, 3)
    assert S.current_snapshot_id(t) == 3
    # latest == union of all appends
    assert _rows(S.read_table(spark, t)) == [(1, 10), (2, 20), (3, 30),
                                             (4, 40)]
    # VERSION AS OF: each snapshot reads exactly its prefix
    assert _rows(S.read_table(spark, t, as_of=1)) == [(1, 10), (2, 20)]
    assert _rows(S.read_table(spark, t, as_of=2)) == [(1, 10), (2, 20),
                                                      (3, 30)]
    h = S.history(t)
    assert [r["snapshot_id"] for r in h] == [1, 2, 3]
    assert [r["parent_id"] for r in h] == [None, 1, 2]
    assert h[0]["metrics"] == {"rows": 2, "rows_written": 2}
    # every commit records what actually landed on disk
    assert [r["metrics"]["rows_written"] for r in h] == [2, 1, 1]
    assert all(r["operation"] == "append" for r in h)


def test_overwrite_and_rollback(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.commit_append(_mk(spark, [(1, 10)]), t)
    S.commit_append(_mk(spark, [(2, 20)]), t)
    S.commit_overwrite(_mk(spark, [(9, 90)]), t)
    assert _rows(S.read_table(spark, t)) == [(9, 90)]
    # old versions still readable (nothing deleted)
    assert _rows(S.read_table(spark, t, as_of=2)) == [(1, 10), (2, 20)]
    # rollback = NEW snapshot exposing the old file set
    s4 = S.rollback(t, 2)
    assert s4 == 4
    assert _rows(S.read_table(spark, t)) == [(1, 10), (2, 20)]
    assert S.history(t)[-1]["operation"] == "rollback"
    # the overwrite snapshot remains addressable after the rollback
    assert _rows(S.read_table(spark, t, as_of=3)) == [(9, 90)]


def test_schema_evolution_on_read(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.commit_append(_mk(spark, [(1, 10)]), t)
    S.commit_append(_mk(spark, [(2, 20, "x")], cols=("k", "v", "tag")), t)
    got = S.read_table(spark, t)
    assert sorted(got.columns) == ["k", "tag", "v"]
    assert _rows(got.select("k", "v", "tag")) == [(1, 10, None),
                                                  (2, 20, "x")]
    # time travel to before the evolution sees the old schema
    assert S.read_table(spark, t, as_of=1).columns == ["k", "v"]


def test_crash_window_is_invisible_and_commit_conflicts(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.commit_append(_mk(spark, [(1, 10)]), t)
    # simulate a crash AFTER the data write, BEFORE the version publish:
    # the orphan dir must not change any read
    S._write_data(_mk(spark, [(666, 666)]), t, "snap-00002")
    assert _rows(S.read_table(spark, t)) == [(1, 10)]
    # retrying the append reuses/overwrites the orphan dir and publishes
    S.commit_append(_mk(spark, [(2, 20)]), t)
    assert _rows(S.read_table(spark, t)) == [(1, 10), (2, 20)]
    # optimistic concurrency: two writers race to version 3 — the second
    # publish (working from a stale current-snapshot read) must fail with
    # CommitConflict, never silently overwrite the winner
    with open(S._version_path(t, 3), "w") as f:
        f.write("{}")
    stale = lambda _table: 2  # noqa: E731 — reader that missed version 3
    orig = S.current_snapshot_id
    S.current_snapshot_id = stale
    try:
        with pytest.raises(S.CommitConflict):
            S._publish(t, {"operation": "append", "data_dirs": [],
                           "schema": {}, "metrics": {}, "stage": ""})
    finally:
        S.current_snapshot_id = orig


def test_expire_snapshots_reclaims_unreferenced_dirs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.commit_append(_mk(spark, [(1, 10)]), t)
    S.commit_overwrite(_mk(spark, [(2, 20)]), t)
    S.commit_append(_mk(spark, [(3, 30)]), t)
    # capture snapshot 1's (writer-unique) data dir before it is expired
    v1_dirs = S._visible_dirs(t, 1)
    assert S.expire_snapshots(t, keep_last=2) == [1]
    # snapshot 1's dir is referenced by nothing retained -> deleted
    assert all(not os.path.isdir(os.path.join(t, rel)) for rel in v1_dirs)
    # retained versions still read exactly
    assert _rows(S.read_table(spark, t)) == [(2, 20), (3, 30)]
    assert _rows(S.read_table(spark, t, as_of=2)) == [(2, 20)]
    with pytest.raises(KeyError):
        S.read_table(spark, t, as_of=1)


def test_lineage_into_snapshots_resumes_mid_run(spark, tmp_path):
    """North-rule sentence end-to-end: per-partition lineage + metrics in
    snapshots, resumable mid-run, union == single uninterrupted run."""
    from pyspark.sql import functions as F

    src = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 17).alias("v"))

    def compute(part):
        return part.groupBy("v").agg(F.count("*").alias("n"),
                                     F.sum("k").alias("sk"))

    # uninterrupted run -> the expected final table
    t_full = str(tmp_path / "full")
    S.run_partitioned_snapshots(spark, src, ["k"], compute, t_full,
                                n_buckets=6, stage="agg")
    expect = _rows(S.read_table(spark, t_full))

    # killed after 2 buckets, then resumed
    t = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="simulated failure"):
        S.run_partitioned_snapshots(spark, src, ["k"], compute, t,
                                    n_buckets=6, stage="agg", fail_after=2)
    assert len(S.history(t)) == 2
    snap = S.run_partitioned_snapshots(spark, src, ["k"], compute, t,
                                       n_buckets=6, stage="agg")
    assert _rows(S.read_table(spark, t)) == expect
    h = S.history(t)
    # one snapshot per bucket, each carrying the lineage metrics
    assert len(h) == 6 and snap == 6
    assert sorted(r["metrics"]["bucket"] for r in h) == list(range(6))
    assert all(r["metrics"]["rows_out"] >= 0 and "checksum" in r["metrics"]
               and r["metrics"]["wall_ms"] >= 0 for r in h)
    # resume re-ran exactly the missing buckets
    done_first = {h[0]["metrics"]["bucket"], h[1]["metrics"]["bucket"]}
    assert {r["metrics"]["bucket"] for r in h[2:]} == set(range(6)) - \
        done_first
    # time travel into the middle of the run: visible rows grow monotonically
    n_prev = 0
    for i in range(1, 7):
        n = S.read_table(spark, t, as_of=i).count()
        assert n >= n_prev
        n_prev = n


def test_history_and_resume_survive_expiry(spark, tmp_path):
    """Regression: history() used range(1, current) and KeyError'd on any
    expired table, breaking run_partitioned_snapshots resume and the
    streaming sink's batch idempotence. It must enumerate retained ids."""
    t = str(tmp_path / "tbl")
    for k in range(1, 5):
        S.commit_append(_mk(spark, [(k, k * 10)]), t, stage="load")
    assert S.expire_snapshots(t, keep_last=2) == [1, 2]
    h = S.history(t)  # raised KeyError before the fix
    assert [r["snapshot_id"] for r in h] == [3, 4]
    # repeated expiry on an already-expired table is a clean no-op
    assert S.expire_snapshots(t, keep_last=2) == []
    # appends keep working over the id gap
    S.commit_append(_mk(spark, [(9, 90)]), t, stage="load")
    assert [r["snapshot_id"] for r in S.history(t)] == [3, 4, 5]
    assert S.expire_snapshots(t, keep_last=1) == [3, 4]
    assert _rows(S.read_table(spark, t)) == [(1, 10), (2, 20), (3, 30),
                                             (4, 40), (9, 90)]


def test_racing_writers_never_clobber_staged_data(spark, tmp_path):
    """Regression: both racing appenders derived the same staged dir name
    from the attempted version and the loser's mode('overwrite') write
    clobbered the winner's published data. Staging is now writer-unique;
    only the version publish races (loudly)."""
    t = str(tmp_path / "tbl")
    S.commit_append(_mk(spark, [(1, 10)]), t)
    # two writers race toward version 2: both stage BEFORE either publishes
    rel_a = S._write_data(_mk(spark, [(2, 20)]), t, "snap-00002")
    rel_b = S._write_data(_mk(spark, [(666, 666)]), t, "snap-00002")
    assert rel_a != rel_b  # unique staging — clobber impossible
    base = S._visible_dirs(t, S.current_snapshot_id(t))
    S._publish(t, {"operation": "append", "stage": "",
                   "data_dirs": base + [rel_a], "schema": {},
                   "metrics": {}})
    # the loser publishes from its stale current-snapshot read -> conflict
    orig = S.current_snapshot_id
    S.current_snapshot_id = lambda _t: 1
    try:
        with pytest.raises(S.CommitConflict):
            S._publish(t, {"operation": "append", "stage": "",
                           "data_dirs": base + [rel_b], "schema": {},
                           "metrics": {}})
    finally:
        S.current_snapshot_id = orig
    # the winner's committed rows are exactly its staged data
    assert _rows(S.read_table(spark, t)) == [(1, 10), (2, 20)]


def test_flagship_chain_resumes_from_snapshots_mid_run(spark, tmp_path):
    """The north rule's full sentence over the REAL flagship chain: the
    per-address BAL pipeline (kNN + zonal medians + AS 3959 lookup) runs
    per hash-bucket of documents with lineage + metrics committed as
    snapshots, is killed mid-run, resumes, and the final table equals the
    uninterrupted run row-for-row."""
    from balrog_spark import corpus, docparse, pipeline

    docs = corpus.spark_documents(spark, 3, 3).cache()
    tiles = corpus.spark_tiles(spark, 3, 3).cache()

    def compute(part):
        # one bucket of address documents through the full production
        # chain; vegetation and tiles stay GLOBAL (the spatial context
        # cannot be bucketed by address hash), so per-bucket cost scales
        # with the bucket, not the corpus
        if docparse.addresses_from_documents(part).rdd.isEmpty():
            return pipeline.address_bal_factors(spark, docs, tiles) \
                .limit(0)
        return pipeline.address_bal_factors(spark, part, tiles,
                                            veg_documents=docs)

    expect = sorted(
        tuple(r) for r in pipeline.address_bal_factors(spark, docs, tiles)
        .collect())

    t = str(tmp_path / "flagship")
    with pytest.raises(RuntimeError, match="simulated failure"):
        S.run_partitioned_snapshots(spark, docs, ["doc_id"], compute, t,
                                    n_buckets=4, stage="bal",
                                    fail_after=2)
    assert len(S.history(t)) == 2          # two buckets committed
    S.run_partitioned_snapshots(spark, docs, ["doc_id"], compute, t,
                                n_buckets=4, stage="bal")
    h = S.history(t)
    assert len(h) == 4
    assert sorted(r["metrics"]["bucket"] for r in h) == [0, 1, 2, 3]
    assert all("checksum" in r["metrics"] and r["metrics"]["wall_ms"] >= 0
               for r in h)
    got = sorted(tuple(r) for r in S.read_table(spark, t)
                 .select(*[f.name for f in
                           pipeline.address_bal_factors(
                               spark, docs, tiles).schema.fields])
                 .collect())
    assert got == expect


def test_compact_rewrites_files_preserves_rows_and_history(spark,
                                                           tmp_path):
    """compact(): row-identical rewrite into a bounded file count,
    published as a new snapshot committed against the parent it read;
    time travel to pre-compact snapshots still reads the original dirs,
    and a commit that raced in first makes the pinned publish conflict
    loudly instead of silently dropping it."""
    t = str(tmp_path / "tbl")
    for i in range(3):
        S.commit_append(_mk(spark, [(f"k{i}{j}", i * 10 + j)
                                    for j in range(4)]).repartition(4),
                        t, stage=f"a{i}")
    base = S.current_snapshot_id(t)
    before = _rows(S.read_table(spark, t))

    def n_files(snap):
        dirs = S._visible_dirs(t, snap)
        return sum(
            sum(1 for fn in os.listdir(os.path.join(t, d))
                if fn.endswith(".parquet"))
            for d in dirs)

    assert len(S._visible_dirs(t, base)) == 3 and n_files(base) >= 6
    sid = S.compact(spark, t, target_files=1)
    assert sid == base + 1
    assert _rows(S.read_table(spark, t)) == before
    assert len(S._visible_dirs(t, sid)) == 1 and n_files(sid) == 1
    rec = S.history(t)[-1]
    assert rec["operation"] == "compact"
    assert rec["metrics"]["compacted_from"] == base
    assert rec["metrics"]["rows_written"] == len(before)
    # pre-compact time travel unaffected
    assert _rows(S.read_table(spark, t, as_of=base)) == before
    assert len(_rows(S.read_table(spark, t, as_of=base - 1))) == 8

    # pinned-parent publish: the version id the compaction read from is
    # already superseded -> CommitConflict, never a silent lost update
    with pytest.raises(S.CommitConflict):
        S._publish(t, {"operation": "compact", "stage": "racer",
                       "data_dirs": [], "schema": {}, "metrics": {}},
                   expected_parent=base)

    # append after compact stacks on the compacted dir
    S.commit_append(_mk(spark, [("z", 99)]), t, stage="post")
    assert len(_rows(S.read_table(spark, t))) == len(before) + 1


def test_remove_orphans_reclaims_lost_stages_only(spark, tmp_path):
    """remove_orphans: unreferenced data dirs older than the grace
    window are deleted; referenced dirs and fresh (possibly in-flight)
    stages survive, and the table reads identically afterwards."""
    t = str(tmp_path / "tbl")
    S.commit_append(_mk(spark, [("a", 1), ("b", 2)]), t, stage="a0")
    before = _rows(S.read_table(spark, t))

    # simulate a commit-race loser: staged dir, never published
    orphan = S._write_data(_mk(spark, [("x", 9)]), t, "snap-loser")
    fresh = S._write_data(_mk(spark, [("y", 8)]), t, "snap-fresh")
    old = os.path.join(t, orphan)
    os.utime(old, (os.path.getmtime(old) - 7200,) * 2)

    removed = S.remove_orphans(t, older_than_s=3600.0)
    assert removed == [orphan]
    assert not os.path.isdir(old)
    assert os.path.isdir(os.path.join(t, fresh))     # inside grace window
    assert _rows(S.read_table(spark, t)) == before
    # idempotent
    assert S.remove_orphans(t, older_than_s=3600.0) == []


def test_commit_append_lost_update_conflicts(spark, tmp_path):
    """The lost-update race: writer A reads its parent's dirs, then a
    concurrent writer B publishes before A does. A's publish is pinned
    to the parent it READ, so it raises CommitConflict instead of
    silently dropping B's data dir from the table."""
    td = str(tmp_path / "t")
    a = spark.range(3).toDF("v")
    b = spark.range(10, 13).toDF("v")
    S.commit_append(a, td, stage="base")

    orig = S._rows_on_disk

    def racy(sp, table_dir, rel):
        S._rows_on_disk = orig      # un-patch before B commits
        S.commit_append(b, td, stage="racer")
        return orig(sp, table_dir, rel)

    S._rows_on_disk = racy
    try:
        with pytest.raises(S.CommitConflict):
            S.commit_append(spark.range(20, 22).toDF("v"), td,
                                    stage="loser")
    finally:
        S._rows_on_disk = orig
    # B's rows are visible; the loser's staged dir is an orphan
    vals = {r.v for r in S.read_table(spark, td).collect()}
    assert vals == {0, 1, 2, 10, 11, 12}


def test_stage_ledger_survives_expiry(spark, tmp_path):
    """expire_snapshots folds expired stages (and bucket ids) into the
    ledger, so batch-id idempotence and bucket resume survive log
    truncation."""
    td = str(tmp_path / "t2")
    for i in range(4):
        S.commit_append(spark.range(i, i + 1).toDF("v"), td,
                                stage=f"batch-{i}",
                                metrics={"bucket": i})
    assert S.expire_snapshots(td, keep_last=1) != []
    # history forgot the early stages; the ledger has not
    hist_stages = {r.get("stage") for r in S.history(td)}
    assert "batch-0" not in hist_stages
    for i in range(4):
        assert S.stage_committed(td, f"batch-{i}")
    assert not S.stage_committed(td, "batch-9")
    assert S.ledger_buckets(td, "batch-0") == {0}
    # repeated expiry keeps the ledger intact (dedup'd, atomic)
    S.commit_append(spark.range(9, 10).toDF("v"), td,
                            stage="batch-4", metrics={"bucket": 4})
    S.expire_snapshots(td, keep_last=1)
    for i in range(5):
        assert S.stage_committed(td, f"batch-{i}")
