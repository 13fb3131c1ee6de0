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
        import re

        for r in rows:
            content = r[content_col]
            if content is None:
                continue
            stem = re.sub(r"[^A-Za-z0-9._-]+", "_", r["url"])[:200]
            with open(os.path.join(path, stem + suffix), "wb") as f:
                f.write(bytes(content))
            if annotations_col is not None and r[annotations_col] is not None:
                # reference layout: <stem>.pdf + <stem>.json siblings
                with open(os.path.join(path, stem + ".json"), "w") as f:
                    f.write(r[annotations_col])

    df.select(*cols).foreachPartition(dump)
