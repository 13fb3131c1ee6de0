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
