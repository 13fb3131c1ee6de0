"""Iceberg-lite snapshot table on plain parquet — the resume/metrics
contract of the north rule ("persists per-partition lineage and
bloc-count metrics to an Iceberg metrics table, and resumes idempotently
from the last committed snapshot") without an Iceberg runtime jar.

Layout under ``base/``::

    data/<batch_id>/part-*.parquet      immutable data files per append
    snapshots/v{N}.json                 full file listing + per-file rows
                                        + committed batch ids + summary
    snapshots/CURRENT                   the live version, swapped by an
                                        ATOMIC rename

Semantics (the three Iceberg properties that matter to a pipeline):

* **Snapshot isolation** — readers resolve ``CURRENT`` once and read only
  the files that snapshot lists; a writer crash after data-write but
  before commit leaves orphan files that NO reader ever sees (unlike
  append-mode parquet, where a half-written batch is immediately
  visible).
* **Idempotent resume** — ``append(df, batch_id)`` is a no-op when
  ``batch_id`` is already in the committed set, so a restarted job
  replays its batches safely; ``committed_batches()`` is the restart
  checkpoint query.
* **Time travel / rollback** — ``read(version=k)`` reads any retained
  snapshot; ``rollback(k)`` swaps ``CURRENT`` back.

Per-file lineage rides in the snapshot itself: row counts are read from
the parquet FOOTERS (no Spark job, no extra scan) and aggregated into
the snapshot summary — the "metrics table" is ``snapshots_df()``, one
row per snapshot. With a real Iceberg catalog the same call sites map to
``MERGE INTO`` + snapshot-id reads; this file is the local-fs stand-in
(rename is atomic on POSIX; on object stores Iceberg swaps a metastore
pointer instead — same contract, different primitive).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base
        self.snap_dir = os.path.join(base, "snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- snapshot log -----------------------------------------------------

    def current_version(self) -> int:
        """0 = empty table (no snapshot yet)."""
        cur = os.path.join(self.snap_dir, "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def _snapshot(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "files": {}, "batches": [], "total_rows": 0}
        with open(os.path.join(self.snap_dir, f"v{version}.json")) as f:
            return json.load(f)

    def committed_batches(self) -> set:
        """The restart checkpoint: batch ids already durable."""
        return set(self._snapshot(self.current_version())["batches"])

    def _max_version(self) -> int:
        """Highest snapshot file ever written — version numbers are
        allocated from here and NEVER reused (Iceberg snapshot ids are
        unique even across rollbacks; reusing a number would overwrite
        history that time travel and the metrics table still read)."""
        best = 0
        for name in os.listdir(self.snap_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1:-5]))
                except ValueError:
                    continue
        return best

    def _transition_child(self, parent: int) -> int | None:
        """The version committed ON TOP OF ``parent``, if any — the
        durable record of who won that parent's commit race."""
        p = os.path.join(self.snap_dir, f"from-v{parent}")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def _link_exclusive(self, content: str, path: str) -> bool:
        """Atomically create ``path`` with ``content`` iff it does not
        exist — ``os.link`` from a fully-written temp file gives
        exclusive-create AND complete-content in one atomic step."""
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
        try:
            os.link(tmp, path)
        except FileExistsError:
            os.unlink(tmp)
            return False
        os.unlink(tmp)
        return True

    def _commit(self, snap: dict) -> bool:
        """Optimistic-concurrency commit (Iceberg's model, two atomic
        steps): (1) claim the unique ``v{N}.json`` name — a loser here
        just retries with a fresh number; (2) CAS the per-parent
        transition marker ``from-v{parent}`` — at most ONE commit may
        build on any parent, so a concurrent read-modify-write can never
        silently erase the other writer's batch (the loser's snapshot
        file becomes an invisible orphan and the caller rebases).
        Returns False on either conflict."""
        version, parent = snap["version"], snap["parent"]
        path = os.path.join(self.snap_dir, f"v{version}.json")
        if not self._link_exclusive(json.dumps(snap, sort_keys=True), path):
            return False
        marker = os.path.join(self.snap_dir, f"from-v{parent}")
        if not self._link_exclusive(str(version), marker):
            return False  # another commit built on this parent first
        self._advance_current(version)
        return True

    def _advance_current(self, version: int) -> None:
        """Move CURRENT forward, never backward — two commits racing on
        different versions must not let the older one's pointer swap land
        last (rollback() is the only sanctioned regression)."""
        if self.current_version() >= version:
            return
        cur_tmp = os.path.join(self.snap_dir, f"CURRENT.tmp.{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(version))
        os.rename(cur_tmp, os.path.join(self.snap_dir, "CURRENT"))  # ATOMIC swap

    # -- write ------------------------------------------------------------

    def append(self, df: DataFrame, batch_id: str) -> bool:
        """Append ``df`` as one committed batch. Returns False (no-op)
        when ``batch_id`` already committed — the idempotence contract.
        Data lands BEFORE the snapshot commit; a crash in between leaves
        invisible orphans, never a torn read."""
        if batch_id in self.committed_batches():
            return False
        data_dir = os.path.join(self.base, "data", f"{batch_id}-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(data_dir)
        files = {}
        for name in sorted(os.listdir(data_dir)):
            if name.endswith(".parquet"):
                p = os.path.join(data_dir, name)
                files[p] = _footer_rows(p)
        # commit-conflict retry loop (Iceberg semantics): data files are
        # written ONCE; on a lost CAS the snapshot is rebuilt against the
        # winner's state and retried. If the winner committed the SAME
        # batch_id, ours becomes invisible orphans and the call reports
        # the idempotent no-op.
        while True:
            cur = self.current_version()
            prev = self._snapshot(cur)
            if batch_id in prev["batches"]:
                return False
            snap = {
                "version": self._max_version() + 1,
                "parent": cur,
                "batch_id": batch_id,
                "ts": time.time(),
                "files": {**prev["files"], **files},
                "batches": sorted(prev["batches"] + [batch_id]),
                "added_files": len(files),
                "added_rows": sum(files.values()),
                "total_rows": prev["total_rows"] + sum(files.values()),
            }
            if self._commit(snap):
                return True
            # lost a race. If a committed transition out of our parent
            # exists but CURRENT lags (winner crashed between its marker
            # link and pointer swap), heal the pointer so the retry makes
            # progress; otherwise the retry re-reads and rebases.
            won = self._transition_child(cur)
            if won is not None and self.current_version() == cur:
                self._advance_current(won)

    def rollback(self, version: int) -> None:
        """Point CURRENT back at snapshot ``version`` (files of later
        snapshots become invisible orphans, like Iceberg rollback). The
        transition marker out of ``version`` is cleared so a new branch
        can commit from there — the abandoned branch keeps its (higher,
        never-reused) version numbers for time travel. Administrative
        operation: not safe against appends running concurrently with
        the rollback itself."""
        if version != 0 and not os.path.exists(
            os.path.join(self.snap_dir, f"v{version}.json")
        ):
            raise ValueError(f"no snapshot v{version}")
        cur_tmp = os.path.join(self.snap_dir, f"CURRENT.tmp.{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(version))
        os.rename(cur_tmp, os.path.join(self.snap_dir, "CURRENT"))
        marker = os.path.join(self.snap_dir, f"from-v{version}")
        if os.path.exists(marker):
            os.unlink(marker)

    # -- read -------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: CURRENT). Reads ONLY the
        files that snapshot lists — snapshot isolation."""
        snap = self._snapshot(
            self.current_version() if version is None else version
        )
        files = sorted(snap["files"])
        if not files:
            raise ValueError("empty table (version 0) has no schema")
        return self.spark.read.parquet(*files)

    def snapshots_df(self) -> DataFrame:
        """The metrics table: one row per snapshot (version, batch_id,
        added_files, added_rows, total_rows, ts)."""
        rows = []
        v = 1
        while os.path.exists(os.path.join(self.snap_dir, f"v{v}.json")):
            s = self._snapshot(v)
            rows.append(
                (
                    s["version"],
                    s.get("batch_id", ""),
                    s.get("added_files", 0),
                    s.get("added_rows", 0),
                    s["total_rows"],
                    float(s.get("ts", 0.0)),
                )
            )
            v += 1
        return self.spark.createDataFrame(
            rows,
            "version int, batch_id string, added_files int,"
            " added_rows bigint, total_rows bigint, ts double",
        )


def _footer_rows(path: str) -> int:
    """Row count from the parquet footer — no Spark job, no data scan."""
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(path).metadata.num_rows)
