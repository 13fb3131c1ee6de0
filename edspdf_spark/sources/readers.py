"""S1/S3/S5/S6 — sources.

The reference hand-rolls directory scanning, fragment-parallel parquet
reads and converter plumbing (``edspdf/data/files.py:33-107``,
``edspdf/data/parquet.py:22-76``, ``data/pandas.py:18-91``,
``data/base.py:71-137``). On Spark every one of those collapses into a
built-in reader — fragment parallelism, predicate pushdown and column
pruning come from Catalyst/DSv2, and Iceberg tables slot in via
``spark.read.table`` when the runtime jar is present.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edspdf_spark.schemas import PAGES_SCHEMA


def read_pages_parquet(
    spark: SparkSession,
    path: str,
    lang: Optional[str] = None,
    columns: Optional[list] = None,
) -> DataFrame:
    """S3 — parquet/Iceberg scan of the pages table.

    ``lang`` and ``columns`` are expressed as filter/select so Catalyst
    pushes them into the scan (PushedFilters / ReadSchema); a 2-column
    projection never reads ``html`` bytes.
    """
    # catalog-table routing: dotted, slash-free AND not parquet-ish — a
    # relative filename like 'pages.parquet' must scan the file, not
    # resolve table 'parquet' in database 'pages'
    is_table = (
        "." in path
        and "/" not in path
        and not path.endswith((".parquet", ".pq"))
        and not os.path.exists(path)
    )
    if is_table:
        df = spark.read.table(path)
    else:
        if "://" not in path and not os.path.isabs(path):
            # the JVM resolves relative paths against ITS working
            # directory, not the Python process's — absolutize here so
            # chdir-relative filenames behave as the caller expects
            path = os.path.abspath(path)
        df = spark.read.schema(PAGES_SCHEMA).parquet(path)
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    if columns:
        df = df.select(*columns)
    return df


def read_files_binary(
    spark: SparkSession,
    path: str,
    glob: str = "*.pdf",
    recursive: bool = True,
    load_annotations: bool = False,
) -> DataFrame:
    """S1 — directory of payload files → pages-shaped DataFrame.

    ``binaryFile`` scans in parallel per file (≙ the reference's one-task-
    per-file ``read_in_worker``); filename becomes the url (reference
    FILENAME converter key, ``data/converters.py:19-20``).

    ``load_annotations=True`` left-joins each payload's sibling ``.json``
    (same stem) as a raw-JSON ``annotations`` string column, matching the
    reference ``FileReader.read_worker`` (``data/files.py:97-103``): a
    payload without a sibling keeps ``annotations = NULL``. (The
    reference's file-list pre-filter at ``files.py:80-83`` tests the
    DIRECTORY path instead of the file — an always-true no-op — so
    attach-if-present is the actual reference behavior.) One distributed
    binaryFile scan per side + a stem equi-join; no driver-side file
    listing.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    out = df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    if load_annotations:
        import re as _re

        # strip exactly the payload glob's extension (urls may contain
        # dots elsewhere); generic trailing-extension strip as fallback
        if glob.startswith("*.") and len(glob) > 2:
            ext_re = _re.escape(glob[1:]) + "$"
        else:
            ext_re = r"\.[^./]+$"
        ann = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.json")
            .option("recursiveFileLookup", str(recursive).lower())
            .load(path)
            .select(
                F.regexp_replace(F.col("path"), r"\.json$", "").alias("_stem"),
                F.col("content").cast("string").alias("annotations"),
            )
        )
        out = (
            out.withColumn("_stem", F.regexp_replace(F.col("url"), ext_re, ""))
            .join(ann, on="_stem", how="left")
            .drop("_stem")
        )
    return out


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """S5 — Arrow-accelerated pandas ingestion."""
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)


def from_iterable(spark: SparkSession, rows: Iterable) -> DataFrame:
    """S6 — python iterable of (url, warc_ts, html, text, lang) tuples."""
    return spark.createDataFrame(list(rows), schema=PAGES_SCHEMA)
