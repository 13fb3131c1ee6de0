"""Idempotent checkpoint/resume for the aggregate sink.

The reference has no resume story (SURVEY.md §4). The north rule requires
"resumes idempotently from the last committed snapshot". Without an Iceberg
runtime jar in this sandbox, the equivalent on plain parquet is:

* output lands in ``data/`` as append-mode parquet,
* each successful batch also appends its url set to a tiny
  ``committed/`` manifest (url-only parquet),
* a restart anti-joins the input against the manifest and processes only
  the remainder — re-running a finished job is a no-op, and a crash
  between data-write and manifest-write re-processes that batch only
  (at-least-once, de-duplicated on read by ``read_result``).

With Iceberg available the same API maps to a snapshot-id check +
``MERGE INTO`` — the call sites don't change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


class ResumableSink:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir
        self.data_dir = os.path.join(base_dir, "data")
        self.manifest_dir = os.path.join(base_dir, "committed")

    def committed_urls(self) -> DataFrame:
        if os.path.exists(self.manifest_dir):
            return self.spark.read.parquet(self.manifest_dir).select("url").distinct()
        return self.spark.createDataFrame([], "url string")

    def remaining(self, pages: DataFrame) -> DataFrame:
        """Anti-join the input against the committed manifest."""
        return pages.join(self.committed_urls(), on="url", how="left_anti")

    def commit(self, result: DataFrame) -> int:
        """Append results + manifest. Returns #urls committed this run."""
        result = result.persist()
        n = result.select("url").distinct().count()
        if n:
            result.write.mode("append").parquet(self.data_dir)
            result.select("url").distinct().write.mode("append").parquet(
                self.manifest_dir
            )
        result.unpersist()
        return n

    def read_result(self) -> DataFrame:
        """Read the sink, de-duplicating any at-least-once replays: keep one
        row per (url, label) — deterministic arbitrary-but-stable pick."""
        df = self.spark.read.parquet(self.data_dir)
        w = Window.partitionBy("url", "label").orderBy(F.col("text"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
