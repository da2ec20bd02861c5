"""Iceberg-pattern snapshot log: versioned tables over plain parquet.

The north rule asks for per-partition lineage + metrics checkpointed "into
Iceberg snapshots". ``lineage.py`` supplies the resume half (bucket
manifests); this module supplies the snapshot half — the Iceberg *commit
pattern* realized over any filesystem, no table-format runtime required:

- a table is a directory of **immutable data dirs** plus an append-only
  version log ``_snapshots/v-NNNNN.json``;
- each snapshot records the **full set of data dirs visible at that
  version** (Iceberg's manifest list), its parent, the operation, the
  schema, and caller metrics;
- a commit is **atomic and conflict-checked**: the version file is staged
  to a temp name and published with ``os.link`` (fails if the version
  already exists — optimistic concurrency, Iceberg's commit protocol);
  a crash between the data write and the version publish leaves an
  *invisible orphan dir*, never a half-visible table;
- readers get **time travel** (``read_table(as_of=...)``), **history with
  metrics**, non-destructive **rollback** (a new snapshot re-exposing an
  old file set), and **schema evolution** on read (missing columns null —
  ``unionByName(allowMissingColumns=True)`` across data dirs).

On a real cluster the same call sites bind to Iceberg's ``append()`` /
``VERSION AS OF``; the on-disk model here is deliberately isomorphic.
Reference behaviour being replaced: the reference reruns its multi-day
prep stages from zero and keeps no versions at all
(reference: data_prep/vegetation/04_merge_geometries.py:129-205).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer published this version first (optimistic-concurrency
    failure). Retry the commit against the new current snapshot."""


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def _version_path(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(_log_dir(table_dir), f"v-{snapshot_id:05d}.json")


def _all_ids(table_dir: str) -> list[int]:
    """Snapshot ids that actually exist on disk, ascending. Expiry deletes
    old version files, so the log need not start at 1 — never iterate
    range(1, current); enumerate."""
    log = _log_dir(table_dir)
    if not os.path.isdir(log):
        return []
    return sorted(int(fn[2:-5]) for fn in os.listdir(log)
                  if fn.startswith("v-") and fn.endswith(".json"))


def current_snapshot_id(table_dir: str) -> int | None:
    ids = _all_ids(table_dir)
    return ids[-1] if ids else None


def _load(table_dir: str, snapshot_id: int) -> dict:
    path = _version_path(table_dir, snapshot_id)
    if not os.path.isfile(path):
        raise KeyError(f"no snapshot {snapshot_id} in {table_dir}")
    with open(path) as f:
        return json.load(f)


def history(table_dir: str) -> list[dict]:
    """All RETAINED snapshots oldest-first (id, parent, operation, metrics,
    ...). Enumerates existing version files rather than 1..current, so an
    expired table (or resume over one) never KeyErrors on the gap."""
    return [_load(table_dir, i) for i in _all_ids(table_dir)]


def _publish(table_dir: str, rec: dict,
             expected_parent: int | None = None) -> int:
    """Atomically publish ``rec`` as the next version. The hard-link
    publish fails iff the version file already exists, which is exactly
    the lost-update race — surfaced as CommitConflict, never silent.

    ``expected_parent`` pins the commit against a KNOWN parent (Iceberg
    commit semantics for rewrites): the version id is expected_parent+1
    regardless of what has landed since, so a concurrent writer that
    already took that id makes this publish conflict instead of quietly
    replacing the table state it never read."""
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    if expected_parent is not None:
        snapshot_id = expected_parent + 1
    else:
        snapshot_id = (current_snapshot_id(table_dir) or 0) + 1
    rec = dict(rec, snapshot_id=snapshot_id,
               parent_id=current_snapshot_id(table_dir),
               timestamp_ms=int(time.time() * 1000))
    final = _version_path(table_dir, snapshot_id)
    tmp = final + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    try:
        os.link(tmp, final)
    except FileExistsError as e:
        raise CommitConflict(
            f"snapshot {snapshot_id} already committed in {table_dir}") \
            from e
    finally:
        os.unlink(tmp)
    return snapshot_id


def _visible_dirs(table_dir: str, snapshot_id: int | None) -> list[str]:
    if snapshot_id is None:
        return []
    return _load(table_dir, snapshot_id)["data_dirs"]


def _rows_on_disk(spark: SparkSession, table_dir: str, rel: str) -> int:
    """Row count of a written data dir from its parquet footers — describes
    what is actually on disk without re-executing the writing plan."""
    return spark.read.parquet(os.path.join(table_dir, rel)).count()


def _write_data(df: DataFrame, table_dir: str, tag: str,
                unique: bool = True) -> str:
    """Write df to a fresh immutable data dir; returns the dir name
    (relative to table_dir). ``unique`` appends a writer-unique suffix
    (pid + uuid) so two racing writers can NEVER stage into the same dir:
    only the version-file publish may race (and it conflicts loudly).
    Without the suffix, the loser's ``mode(overwrite)`` stage could clobber
    the winner's already-published data dir. Orphan dirs from the loser
    stay invisible (no snapshot names them) and are never reclaimed by
    expire_snapshots — the same garbage Iceberg leaves for
    remove_orphan_files."""
    if unique:
        tag = f"{tag}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    rel = os.path.join("data", tag)
    df.write.mode("overwrite").parquet(os.path.join(table_dir, rel))
    return rel


def commit_append(df: DataFrame, table_dir: str, stage: str = "",
                  metrics: dict | None = None) -> int:
    """Append ``df`` as a new snapshot: parent's visible dirs + one new
    immutable dir. Each writer stages to its own unique dir and the
    published snapshot records that exact dir, so concurrent appends
    conflict at publish time instead of corrupting each other; the loser's
    staged dir is an invisible orphan.

    The publish is PINNED to the parent whose dirs were read
    (``expected_parent``): between the dirs read and the publish, this
    writer spends seconds in the data write + footer count, and an
    unpinned publish would take the next free version id while still
    carrying the OLD dirs list — silently dropping whatever a
    concurrent writer published in between. Pinning turns that lost
    update into a loud CommitConflict."""
    parent = current_snapshot_id(table_dir)
    rel = _write_data(df, table_dir, f"snap-{(parent or 0) + 1:05d}")
    dirs = _visible_dirs(table_dir, parent)
    if rel not in dirs:
        dirs = dirs + [rel]
    return _publish(table_dir, {
        "operation": "append", "stage": stage, "data_dirs": dirs,
        "schema": df.schema.jsonValue(),
        "metrics": dict(metrics or {}, rows_written=_rows_on_disk(
            df.sparkSession, table_dir, rel)),
    }, expected_parent=parent or 0)


def commit_overwrite(df: DataFrame, table_dir: str, stage: str = "",
                     metrics: dict | None = None) -> int:
    """Replace the visible file set (Iceberg REPLACE): old snapshots keep
    reading the old dirs — nothing is deleted until expire_snapshots.
    Pinned to the parent read at entry (same lost-update rationale as
    :func:`commit_append`: an overwrite that raced an append would
    otherwise silently discard the append with no conflict)."""
    parent = current_snapshot_id(table_dir)
    rel = _write_data(df, table_dir, f"snap-{(parent or 0) + 1:05d}")
    return _publish(table_dir, {
        "operation": "overwrite", "stage": stage, "data_dirs": [rel],
        "schema": df.schema.jsonValue(),
        "metrics": dict(metrics or {}, rows_written=_rows_on_disk(
            df.sparkSession, table_dir, rel)),
    }, expected_parent=parent or 0)


def rollback(table_dir: str, snapshot_id: int) -> int:
    """Non-destructive rollback: a NEW snapshot re-exposing ``snapshot_id``'s
    file set (Iceberg ``rollback_to_snapshot``). History is preserved.
    Pinned to the head read at entry so a rollback that races another
    writer conflicts instead of silently discarding their commit."""
    target = _load(table_dir, snapshot_id)
    parent = current_snapshot_id(table_dir)
    return _publish(table_dir, {
        "operation": "rollback", "stage": f"rollback-to-{snapshot_id}",
        "data_dirs": target["data_dirs"], "schema": target["schema"],
        "metrics": {"rolled_back_to": snapshot_id},
    }, expected_parent=parent or 0)


def read_table(spark: SparkSession, table_dir: str,
               as_of: int | None = None) -> DataFrame:
    """Read the table at ``as_of`` (default: current snapshot) — Iceberg's
    ``VERSION AS OF``. Data dirs may have different schemas (evolution):
    the whole visible set is read as ONE parquet relation with
    ``mergeSchema`` (columns added later read as null for older dirs), so
    the plan stays a single scan node however many snapshots the table has
    accumulated — not an O(snapshots)-deep union chain."""
    snap = current_snapshot_id(table_dir) if as_of is None else as_of
    if snap is None:
        raise KeyError(f"{table_dir} has no snapshots")
    dirs = _visible_dirs(table_dir, snap)
    if not dirs:
        raise KeyError(f"snapshot {snap} of {table_dir} is empty")
    return (spark.read.option("mergeSchema", "true")
            .parquet(*[os.path.join(table_dir, rel) for rel in dirs]))


def _ledger_path(table_dir: str) -> str:
    return os.path.join(_log_dir(table_dir), "stage-ledger.json")


def _ledger_entries(table_dir: str) -> list[dict]:
    lp = _ledger_path(table_dir)
    if not os.path.isfile(lp):
        return []
    with open(lp) as f:
        return json.load(f)


def stage_committed(table_dir: str, stage: str) -> bool:
    """Has ANY snapshot — retained or since-expired — committed this
    stage? This is the idempotence primitive the streaming sinks and
    bucket resume must use instead of scanning ``history()``:
    ``expire_snapshots`` deletes version files, so a history scan
    forgets committed batch ids after log truncation and a replayed
    micro-batch would double-append. Expiry therefore folds the expired
    records' (stage, bucket) pairs into a compact ledger that this
    check consults after the version files. Retained files are scanned
    newest-first — a streaming replay probes the most recent batch, so
    the common case is O(1)."""
    if not stage:
        return False
    for i in reversed(_all_ids(table_dir)):
        if _load(table_dir, i).get("stage") == stage:
            return True
    return any(e.get("stage") == stage for e in _ledger_entries(table_dir))


def ledger_buckets(table_dir: str, stage: str) -> set:
    """Bucket ids recorded for ``stage`` in the expiry ledger (the
    since-expired half of :func:`run_partitioned_snapshots`' resume
    set)."""
    return {e.get("bucket") for e in _ledger_entries(table_dir)
            if e.get("stage") == stage and e.get("bucket") is not None}


def expire_snapshots(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots and DELETE data dirs
    no retained snapshot references (Iceberg ``expire_snapshots``) —
    the storage-reclaim half of the versioning contract. Returns the
    expired snapshot ids. Enumerates existing ids, so repeated expiry on an
    already-expired table is a no-op, not a KeyError.

    ``keep_last`` must be >= 1: retaining zero snapshots would delete every
    version file AND data dir, leaving a table read_table can no longer
    open — refuse loudly rather than silently truncate (Iceberg's
    expire_snapshots likewise always retains the current snapshot)."""
    if keep_last < 1:
        raise ValueError(
            f"expire_snapshots(keep_last={keep_last}): must retain at "
            "least one snapshot; expiring every version would make the "
            "table unreadable")
    ids = _all_ids(table_dir)
    if not ids:
        return []
    retained = ids[max(0, len(ids) - keep_last):]
    keep_dirs: set[str] = set()
    for i in retained:
        keep_dirs.update(_visible_dirs(table_dir, i))
    doomed = [i for i in ids if i not in retained]
    # fold the doomed records' stages into the ledger FIRST (atomic
    # tmp+rename, dedup'd): a crash mid-expiry must never leave a
    # committed batch id forgotten by both the log and the ledger
    new_entries = []
    for i in doomed:
        rec = _load(table_dir, i)
        if rec.get("stage"):
            new_entries.append({
                "stage": rec["stage"],
                "bucket": (rec.get("metrics") or {}).get("bucket")})
    if new_entries:
        entries = _ledger_entries(table_dir)
        seen = {(e.get("stage"), e.get("bucket")) for e in entries}
        entries += [e for e in new_entries
                    if (e["stage"], e["bucket"]) not in seen]
        lp = _ledger_path(table_dir)
        tmp = lp + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, lp)
    expired = []
    for i in doomed:
        for rel in _visible_dirs(table_dir, i):
            if rel not in keep_dirs:
                shutil.rmtree(os.path.join(table_dir, rel),
                              ignore_errors=True)
        os.unlink(_version_path(table_dir, i))
        expired.append(i)
    return expired


def run_partitioned_snapshots(spark: SparkSession, inputs: DataFrame,
                              key_cols, compute, table_dir: str,
                              n_buckets: int = 8, stage: str = "stage",
                              fail_after: int | None = None) -> int:
    """The north rule's full sentence in one call: per-partition (hash
    bucket) execution whose lineage + metrics land in snapshots, resumable
    mid-run. Each completed bucket is one append snapshot carrying
    rows_out / wall_ms / checksum metrics; on re-run, buckets that already
    own a snapshot are skipped, so a kill between buckets resumes exactly
    where it stopped and the final table equals a single uninterrupted run
    (asserted in tests). See lineage.run_partitioned for the
    manifest-file variant without versioning."""
    from pyspark.sql import functions as F

    from .lineage import _cheap_checksum

    # retained snapshots + the expiry ledger: a bucket completed before
    # an expire_snapshots run must still be skipped on resume
    done = {rec["metrics"].get("bucket") for rec in history(table_dir)
            if rec.get("stage") == stage} | ledger_buckets(table_dir, stage)
    bucket_col = F.pmod(F.hash(*key_cols), F.lit(n_buckets)).cast("int")
    src = inputs.withColumn("_bucket", bucket_col)
    processed = 0
    snap = current_snapshot_id(table_dir) or 0
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = src.filter(F.col("_bucket") == b).drop("_bucket")
        out = compute(part)
        # stage the bucket to its own immutable dir, then read back so the
        # metrics describe what is actually on disk (single compute)
        rel = _write_data(out, table_dir, f"{stage}-bucket-{b:05d}")
        written = spark.read.parquet(os.path.join(table_dir, rel))
        parent = current_snapshot_id(table_dir)
        dirs = _visible_dirs(table_dir, parent)
        if rel not in dirs:
            dirs = dirs + [rel]
        # pinned publish: two racing resumes of the same stage would
        # otherwise silently drop each other's bucket dirs
        snap = _publish(table_dir, {
            "operation": "append", "stage": stage, "data_dirs": dirs,
            "schema": written.schema.jsonValue(),
            "metrics": {"bucket": b, "rows_out": written.count(),
                        "wall_ms": int((time.time() - t0) * 1000),
                        "checksum": _cheap_checksum(written)},
        }, expected_parent=parent or 0)
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated failure after {processed} buckets")
    return snap


def compact(spark: SparkSession, table_dir: str,
            target_files: int | None = None, stage: str = "compact") -> int:
    """Iceberg ``rewrite_data_files``: rewrite the CURRENT visible file
    set into one fresh data dir with a bounded file count and publish a
    row-identical 'compact' snapshot committed AGAINST the parent it
    read — a concurrent append that lands first wins the version id and
    this publish raises CommitConflict instead of silently discarding
    rows it never saw (retry by re-running). Older snapshots keep
    reading their original dirs (time travel intact); disk is reclaimed
    by expire_snapshots.

    This is the operational pair of streaming ingest: every micro-batch
    commit adds a small file set, and a periodic compact bounds the file
    count a reader's scan must open — at 100 TB the small-files problem
    is the difference between a planning step and a planning outage."""
    base = current_snapshot_id(table_dir)
    if base is None:
        raise KeyError(f"{table_dir} has no snapshots")
    df = read_table(spark, table_dir, as_of=base)
    n_files = int(target_files or spark.sparkContext.defaultParallelism)
    rel = _write_data(df.repartition(n_files), table_dir,
                      f"compact-{base:05d}")
    return _publish(table_dir, {
        "operation": "compact", "stage": stage, "data_dirs": [rel],
        "schema": df.schema.jsonValue(),
        "metrics": {"compacted_from": int(base),
                    "rows_written": _rows_on_disk(spark, table_dir, rel)},
    }, expected_parent=base)


def remove_orphans(table_dir: str, older_than_s: float = 3600.0) -> list:
    """Delete data dirs NO retained snapshot references (Iceberg
    ``remove_orphan_files``) — the garbage left by commit-race losers
    and writers that crashed between staging and publish. Orphans
    younger than ``older_than_s`` are kept: an in-flight writer has
    already staged its dir but not yet published its version file, and
    deleting under it would corrupt a commit that is about to succeed
    (the same grace window Iceberg's procedure uses). Returns the
    removed dir names (relative to table_dir)."""
    data_root = os.path.join(table_dir, "data")
    if not os.path.isdir(data_root):
        return []
    referenced: set[str] = set()
    for i in _all_ids(table_dir):
        referenced.update(_visible_dirs(table_dir, i))
    now = time.time()
    removed = []
    for name in sorted(os.listdir(data_root)):
        rel = os.path.join("data", name)
        full = os.path.join(data_root, name)
        if rel in referenced or not os.path.isdir(full):
            continue
        if now - os.path.getmtime(full) < older_than_s:
            continue                       # possibly an in-flight stage
        shutil.rmtree(full, ignore_errors=True)
        removed.append(rel)
    return removed
