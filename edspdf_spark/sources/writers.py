"""S2/S4/S5/S6 — sinks.

The reference batches rows into 1024-row files by hand
(``edspdf/data/parquet.py:82-174``); Spark's ``maxRecordsPerFile`` does the
same declaratively. ``write_files`` mirrors S2 (one payload file per doc)
via ``foreachPartition`` — executor-side, no driver funnel.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    num_rows_per_file: Optional[int] = 1024,
    partition_by: Optional[list] = None,
) -> None:
    """S4 — parquet sink; ``num_rows_per_file`` ≙ the reference's writer
    batching knob; ``mode='error'`` ≙ its overwrite guard."""
    w = df.write.mode(mode)
    if num_rows_per_file:
        w = w.option("maxRecordsPerFile", int(num_rows_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def to_pandas(df: DataFrame):
    """S5 — Arrow-accelerated collect."""
    return df.toPandas()


def to_iterable(df: DataFrame) -> Iterator:
    """S6 — streaming iterator over rows (no full driver materialization)."""
    return df.toLocalIterator()


def write_files(
    df: DataFrame,
    path: str,
    content_col: str = "html",
    annotations_col: Optional[str] = None,
    suffix: str = "",
) -> None:
    """S2 — write each row's payload back as ``<urlsafe-id>`` files,
    executor-side (reference ``data/files.py:110-181``).

    ``annotations_col`` (a JSON string column) additionally writes the
    sibling ``<urlsafe-id>.json`` per row where non-null — the reference
    FileWriter's annotation sidecar, re-read by
    ``read_files_binary(load_annotations=True)``.
    """
    os.makedirs(path, exist_ok=True)
    cols = ["url", content_col] + ([annotations_col] if annotations_col else [])

    def dump(rows):
        import hashlib
        import re

        for r in rows:
            content = r[content_col]
            if content is None:
                continue
            # the sanitized stem alone is NOT collision-free ('http://a/b'
            # and 'http://a_b' collapse identically; 200-char truncation
            # merges long urls) — a digest of the FULL url disambiguates,
            # so two distinct urls can never overwrite each other's
            # payload or swap annotation sidecars
            digest = hashlib.md5(r["url"].encode("utf-8")).hexdigest()[:10]
            stem = (
                re.sub(r"[^A-Za-z0-9._-]+", "_", r["url"])[:200] + "-" + digest
            )
            with open(os.path.join(path, stem + suffix), "wb") as f:
                f.write(bytes(content))
            if annotations_col is not None and r[annotations_col] is not None:
                # reference layout: <stem>.pdf + <stem>.json siblings
                with open(os.path.join(path, stem + ".json"), "w") as f:
                    f.write(r[annotations_col])

    df.select(*cols).foreachPartition(dump)


def write_training_shards(
    df: DataFrame,
    path: str,
    by_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 1024,
    mode: str = "error",
    num_rows_per_file: Optional[int] = None,
) -> None:
    """Training-corpus sink: the seeded deterministic global shuffle
    (``quality.with_shuffle_order``) made physical. Rows land in
    ``shuffle_shard=K/`` directories, RANK-SORTED within each shard's
    files, so a trainer streaming shards 0..n-1 (files in order) reads
    the exact (seed, key)-hash permutation — reproducible across
    engines, retries and resumes; a new ``seed`` per epoch re-lays the
    corpus without any RNG state.

    Plan: one shard-keyed exchange (``repartition(shuffle_shard)``) +
    Tungsten sort within partitions — the ONLY shuffle the whole
    shuffle-and-write stage needs; no global sort, no driver funnel. At
    10^12 docs raise ``n_shards`` until a shard fits one task (same
    sizing rule as ``pack_chunks``).
    """
    from pyspark.sql import functions as F

    from edspdf_spark.functions.quality import with_shuffle_order

    out = with_shuffle_order(df, by_col=by_col, seed=seed, n_shards=n_shards)
    out = out.repartition("shuffle_shard").sortWithinPartitions(
        "shuffle_shard", "shuffle_rank", F.col(by_col)
    )
    w = out.write.mode(mode)
    if num_rows_per_file:
        w = w.option("maxRecordsPerFile", int(num_rows_per_file))
    w.partitionBy("shuffle_shard").parquet(path)
