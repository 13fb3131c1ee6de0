"""Iceberg-lite snapshot table: isolation, idempotent resume, time travel."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from edspdf_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="edspdf_snap_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS doc_id", "CAST(id AS STRING) AS text")


def test_append_read_and_metrics(spark, base):
    t = SnapshotTable(spark, base)
    assert t.current_version() == 0 and t.committed_batches() == set()
    assert t.append(_df(spark, 0, 10), "b1") is True
    assert t.append(_df(spark, 10, 15), "b2") is True
    assert t.current_version() == 2
    assert t.read().count() == 15
    meta = {r.version: (r.batch_id, r.added_rows, r.total_rows) for r in t.snapshots_df().collect()}
    assert meta[1] == ("b1", 10, 10)
    assert meta[2] == ("b2", 5, 15)


def test_idempotent_resume(spark, base):
    t = SnapshotTable(spark, base)
    t.append(_df(spark, 0, 10), "b1")
    # a restarted job replays its batch: must be a committed no-op
    assert t.append(_df(spark, 0, 10), "b1") is False
    assert t.read().count() == 10
    assert t.committed_batches() == {"b1"}
    # the restart checkpoint tells the job what is left to do
    todo = [b for b in ("b1", "b2") if b not in t.committed_batches()]
    assert todo == ["b2"]


def test_crash_between_data_and_commit_is_invisible(spark, base):
    t = SnapshotTable(spark, base)
    t.append(_df(spark, 0, 10), "b1")
    # simulate the torn write: data files land, snapshot commit never runs
    orphan = os.path.join(base, "data", "orphan-deadbeef")
    _df(spark, 100, 200).write.parquet(orphan)
    assert t.read().count() == 10  # reader never sees the orphan
    assert t.committed_batches() == {"b1"}


def test_time_travel_and_rollback(spark, base):
    t = SnapshotTable(spark, base)
    t.append(_df(spark, 0, 10), "b1")
    t.append(_df(spark, 10, 30), "b2")
    assert t.read(version=1).count() == 10
    assert t.read(version=2).count() == 30
    t.rollback(1)
    assert t.read().count() == 10
    assert t.committed_batches() == {"b1"}
    # append after rollback branches forward again
    t.append(_df(spark, 50, 55), "b3")
    assert t.read().count() == 15
    with pytest.raises(ValueError):
        t.rollback(99)


def test_commit_conflict_retries_against_winner(spark, base):
    """Optimistic-concurrency commit: when another writer already claimed
    the next version (and may have crashed before the CURRENT swap), a
    concurrent append must NOT erase that batch — it heals the pointer,
    rebases onto the winner's snapshot, and commits on top."""
    import json

    t = SnapshotTable(spark, base)
    assert t.append(_df(spark, 0, 5), "b1") is True
    # simulate a concurrent winner that committed v2 (batch "other") but
    # crashed between the v2.json link and the CURRENT swap
    with open(os.path.join(t.snap_dir, "v1.json")) as f:
        v1 = json.load(f)
    v2 = dict(
        v1,
        version=2,
        parent=1,
        batch_id="other",
        batches=sorted(v1["batches"] + ["other"]),
    )
    with open(os.path.join(t.snap_dir, "v2.json"), "w") as f:
        json.dump(v2, f)
    with open(os.path.join(t.snap_dir, "from-v1"), "w") as f:
        f.write("2")  # the winner's committed transition marker
    assert t.current_version() == 1  # pointer still lagging
    assert t.append(_df(spark, 5, 8), "b2") is True
    # the retry's first attempt allocated v3 then lost the from-v1 CAS —
    # v3 is an invisible orphan, the rebased commit lands as v4
    assert t.current_version() == 4
    assert t.committed_batches() == {"b1", "other", "b2"}
    # the winner's rows are part of the rebased lineage, b2's rows added
    assert t.read().count() == 8


def test_append_same_batch_as_crashed_winner_is_noop(spark, base):
    """If the crashed winner committed the SAME batch id, the retry sees
    it after healing and reports the idempotent no-op."""
    import json

    t = SnapshotTable(spark, base)
    assert t.append(_df(spark, 0, 5), "b1") is True
    with open(os.path.join(t.snap_dir, "v1.json")) as f:
        v1 = json.load(f)
    v2 = dict(
        v1,
        version=2,
        parent=1,
        batch_id="b2",
        batches=sorted(v1["batches"] + ["b2"]),
    )
    with open(os.path.join(t.snap_dir, "v2.json"), "w") as f:
        json.dump(v2, f)
    with open(os.path.join(t.snap_dir, "from-v1"), "w") as f:
        f.write("2")
    assert t.append(_df(spark, 5, 8), "b2") is False
    assert t.current_version() == 2
    assert t.committed_batches() == {"b1", "b2"}


def _parquet_files(snap_base):
    out = []
    data = os.path.join(snap_base, "data")
    for d in os.listdir(data):
        for fn in os.listdir(os.path.join(data, d)):
            if fn.endswith(".parquet"):
                out.append(os.path.join(data, d, fn))
    return sorted(out)


def test_compact_rewrites_without_changing_content(spark, base):
    t = SnapshotTable(spark, base)
    for i in range(4):
        t.append(_df(spark, i * 10, i * 10 + 10).repartition(3), f"b{i}")
    before = sorted(r.doc_id for r in t.read().collect())
    pre_version = t.current_version()
    v = t.compact(n_files=1)
    assert v == pre_version + 1 and t.current_version() == v
    # content identical, committed set preserved (idempotent resume intact)
    assert sorted(r.doc_id for r in t.read().collect()) == before
    assert t.committed_batches() == {"b0", "b1", "b2", "b3"}
    assert t.append(_df(spark, 0, 10), "b0") is False  # replay still no-op
    # the CURRENT snapshot now lists exactly one file
    snap = t._snapshot(v)
    assert len(snap["files"]) == 1 and snap["total_rows"] == 40
    # pre-compaction snapshot still time-travels (files not yet vacuumed)
    assert t.read(version=pre_version).count() == 40
    # metrics row records the compaction as zero added rows
    meta = {r.version: r.added_rows for r in t.snapshots_df().collect()}
    assert meta[v] == 0


def test_compact_empty_table_is_noop(spark, base):
    t = SnapshotTable(spark, base)
    assert t.compact() == 0


def test_append_after_compact(spark, base):
    t = SnapshotTable(spark, base)
    t.append(_df(spark, 0, 10), "b0")
    t.compact(n_files=1)
    assert t.append(_df(spark, 10, 20), "b1") is True
    assert t.read().count() == 20


def test_expire_snapshots_reclaims_files_and_history(spark, base):
    t = SnapshotTable(spark, base)
    for i in range(3):
        t.append(_df(spark, i * 10, i * 10 + 10).repartition(2), f"b{i}")
    t.compact(n_files=1)
    n_files_before = len(_parquet_files(base))
    stats = t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    assert stats["snapshots_removed"] == 3
    assert stats["files_removed"] > 0
    # only the compacted file remains on disk
    assert len(_parquet_files(base)) == 1 < n_files_before
    # current read unaffected; committed set carried by the snapshot
    assert t.read().count() == 30
    assert t.committed_batches() == {"b0", "b1", "b2"}
    # time travel to an expired version now fails
    with pytest.raises(Exception):
        t.read(version=1)
    # metrics table lists only the retained snapshot
    assert [r.version for r in t.snapshots_df().collect()] == [4]


def test_expire_keeps_lineage_depth(spark, base):
    t = SnapshotTable(spark, base)
    for i in range(4):
        t.append(_df(spark, i, i + 1), f"b{i}")
    t.expire_snapshots(keep_last=2, orphan_min_age_s=0.0)
    vs = [r.version for r in t.snapshots_df().collect()]
    assert vs == [3, 4]
    assert t.read(version=3).count() == 3  # retained ancestor still reads


def test_expired_version_numbers_are_never_reallocated(spark, base):
    t = SnapshotTable(spark, base)
    t.append(_df(spark, 0, 5), "b0")
    t.append(_df(spark, 5, 10), "b1")
    # roll back to v1: v2 becomes an abandoned branch ABOVE current
    t.rollback(1)
    t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)  # deletes v2's file
    assert t.append(_df(spark, 10, 15), "b2") is True
    # without the high-water mark this would have been allocated as v2 again
    assert t.current_version() == 3


def test_orphan_age_floor_protects_inflight_writes(spark, base):
    t = SnapshotTable(spark, base)
    t.append(_df(spark, 0, 10), "b0")
    # simulate an in-flight append: data written, snapshot not committed
    inflight = os.path.join(base, "data", "b9-inflight")
    _df(spark, 90, 95).write.mode("overwrite").parquet(inflight)
    stats = t.expire_snapshots(keep_last=1, orphan_min_age_s=3600.0)
    assert stats["files_removed"] == 0  # too young to touch
    assert os.path.isdir(inflight)


def test_expire_with_larger_keep_last_than_prior_expiry(spark, base):
    # a previous expiry deleted ancestors; re-running with a LARGER
    # keep_last must stop the parent walk at the lineage gap instead of
    # raising FileNotFoundError on the already-deleted snapshot file
    t = SnapshotTable(spark, base)
    for i in range(4):
        t.append(_df(spark, i, i + 1), f"b{i}")
    t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    stats = t.expire_snapshots(keep_last=3, orphan_min_age_s=0.0)
    assert stats["snapshots_removed"] == 0
    assert t.read().count() == 4
    # new appends extend the retained lineage normally afterwards
    assert t.append(_df(spark, 10, 12), "b9") is True
    assert t.read().count() == 6


def test_expire_with_missing_head_snapshot_raises_loudly(spark, base):
    # CURRENT pointing at a missing snapshot file is corruption, not a
    # lineage gap: expire must raise, NOT compute an empty keep-set and
    # delete the whole table
    t = SnapshotTable(spark, base)
    t.append(_df(spark, 0, 5), "b0")
    t.append(_df(spark, 5, 10), "b1")
    head = t.current_version()
    os.unlink(os.path.join(base, "snapshots", f"v{head}.json"))
    with pytest.raises(FileNotFoundError):
        t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    # the surviving ancestor snapshot was not touched
    assert t.read(version=head - 1).count() == 5
