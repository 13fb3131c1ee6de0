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
        """Highest snapshot number ever allocated — version numbers are
        allocated from here and NEVER reused (Iceberg snapshot ids are
        unique even across rollbacks; reusing a number would overwrite
        history that time travel and the metrics table still read).
        ``MAX_ALLOCATED`` carries the high-water mark across
        :meth:`expire_snapshots`, which may delete the highest-numbered
        (abandoned-branch) snapshot files themselves."""
        best = 0
        for name in os.listdir(self.snap_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1:-5]))
                except ValueError:
                    continue
        hw = os.path.join(self.snap_dir, "MAX_ALLOCATED")
        if os.path.exists(hw):
            with open(hw) as f:
                best = max(best, int(f.read().strip()))
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

    def _versions_on_disk(self) -> list:
        out = []
        for name in os.listdir(self.snap_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def snapshots_df(self) -> DataFrame:
        """The metrics table: one row per RETAINED snapshot (version,
        batch_id, added_files, added_rows, total_rows, ts). Versions may
        have gaps after :meth:`expire_snapshots` (and lost-race orphan
        snapshots appear — they carry real file lineage)."""
        rows = []
        for v in self._versions_on_disk():
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
        return self.spark.createDataFrame(
            rows,
            "version int, batch_id string, added_files int,"
            " added_rows bigint, total_rows bigint, ts double",
        )

    # -- maintenance (the Iceberg rewrite_data_files / expire_snapshots /
    # -- remove_orphan_files trio, local-fs form) --------------------------

    def compact(self, n_files: int = 1) -> int:
        """Rewrite the CURRENT snapshot's data into ``n_files`` larger
        files and commit the result as a new snapshot — the
        ``rewrite_data_files`` maintenance action. Every append creates
        its own small files; at crawl cadence (thousands of micro-batches)
        the table degrades into the classic small-file problem, where scan
        task count and footer/open overhead — not bytes — dominate read
        cost. Compaction trades one bounded rewrite for every later scan.

        The committed ``batches`` set carries over UNCHANGED, so
        idempotent-resume semantics survive (a replayed batch id is still
        a no-op); ``total_rows`` is asserted identical via parquet
        footers before the commit. Prior snapshots keep their (old) file
        lists for time travel until :meth:`expire_snapshots` reclaims
        them. Administrative: retries its rewrite if an append wins the
        commit race. Returns the new version (0 = empty table, nothing
        to do)."""
        if n_files < 1:
            raise ValueError(f"n_files must be >= 1, got {n_files}")
        while True:
            cur = self.current_version()
            if cur == 0:
                return 0
            prev = self._snapshot(cur)
            data_dir = os.path.join(
                self.base, "data", f"compact-{uuid.uuid4().hex}"
            )
            self.spark.read.parquet(*sorted(prev["files"])).coalesce(
                int(n_files)
            ).write.mode("overwrite").parquet(data_dir)
            files = {}
            for name in sorted(os.listdir(data_dir)):
                if name.endswith(".parquet"):
                    p = os.path.join(data_dir, name)
                    files[p] = _footer_rows(p)
            if sum(files.values()) != prev["total_rows"]:
                raise RuntimeError(
                    "compaction row-count mismatch: "
                    f"{sum(files.values())} != {prev['total_rows']}"
                )
            snap = {
                "version": self._max_version() + 1,
                "parent": cur,
                "batch_id": "__compact__",
                "ts": time.time(),
                "files": files,
                "batches": prev["batches"],
                "added_files": len(files),
                "added_rows": 0,
                "total_rows": prev["total_rows"],
                "compaction": True,
            }
            if self._commit(snap):
                return snap["version"]
            # an append won the race: its snapshot includes files ours
            # does not — rewrite against the new CURRENT (our files
            # become vacuum-able orphans)
            won = self._transition_child(cur)
            if won is not None and self.current_version() == cur:
                self._advance_current(won)

    def expire_snapshots(
        self, keep_last: int = 1, orphan_min_age_s: float = 86400.0
    ) -> dict:
        """Retention: keep the last ``keep_last`` snapshots of the
        CURRENT lineage (parent chain from CURRENT), delete every other
        snapshot file, then remove data files no retained snapshot
        references and crash/lost-race orphan directories older than
        ``orphan_min_age_s`` (Iceberg's ``expire_snapshots`` +
        ``remove_orphan_files``; the age floor keeps an in-flight
        append's just-written-uncommitted files safe, same reasoning as
        Iceberg's 3-day default). Time travel to an expired version
        raises afterwards; the version high-water mark is preserved so
        expired numbers are never reallocated. Administrative: not safe
        against a concurrent rollback. Returns
        ``{"snapshots_removed", "files_removed"}``."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        # preserve the allocation high-water mark BEFORE deleting files
        hw = os.path.join(self.snap_dir, "MAX_ALLOCATED")
        tmp = hw + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(self._max_version()))
        os.rename(tmp, hw)

        retained = []
        v = self.current_version()
        while v != 0 and len(retained) < keep_last:
            # ANCESTORS beyond a previous expiry's retention are already
            # gone from disk; a gap there means the retained lineage ends
            # (keep_last larger than what survives must not raise). The
            # HEAD snapshot is different: CURRENT pointing at a missing
            # file is corruption, and proceeding would compute an empty
            # keep-set and delete the whole table — let _snapshot raise.
            if retained and not os.path.exists(
                os.path.join(self.snap_dir, f"v{v}.json")
            ):
                break
            retained.append(v)
            v = self._snapshot(v).get("parent", 0)
        keep = set(retained)
        snaps_removed = 0
        for ver in self._versions_on_disk():
            if ver not in keep:
                os.unlink(os.path.join(self.snap_dir, f"v{ver}.json"))
                # a dangling transition marker would block the next commit
                # from a retained parent only if it pointed at a removed
                # child; clear markers whose child is gone
                snaps_removed += 1
        for name in list(os.listdir(self.snap_dir)):
            if name.startswith("from-v"):
                p = os.path.join(self.snap_dir, name)
                with open(p) as f:
                    child = int(f.read().strip())
                if child not in keep:
                    os.unlink(p)

        referenced = set()
        for ver in keep:
            referenced.update(self._snapshot(ver)["files"])
        files_removed = 0
        data_root = os.path.join(self.base, "data")
        now = time.time()
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                dd = os.path.join(data_root, d)
                for fn in sorted(os.listdir(dd)):
                    p = os.path.join(dd, fn)
                    if p in referenced:
                        continue
                    if now - os.path.getmtime(p) < orphan_min_age_s:
                        continue
                    os.unlink(p)
                    files_removed += 1
                if not os.listdir(dd):
                    os.rmdir(dd)
        return {"snapshots_removed": snaps_removed, "files_removed": files_removed}


def _footer_rows(path: str) -> int:
    """Row count from the parquet footer — no Spark job, no data scan."""
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(path).metadata.num_rows)
