"""Skew handling: length-bucketed, salted repartitioning of the pages table.

The reference's only skew tool is sorting chunks by box count before
batching (``edspdf/processing/simple.py:74-79``, ``sort_chunks``). At
cluster scale the equivalent problem is a 10k-page document landing in a
partition of one-pagers and stalling the stage (SURVEY.md §7.3). The
BASELINE mandates salted repartitioning + length-bucketed partitions.

Strategy: ``bucket = floor(log2(octet_length(html)))`` groups documents of
similar parse cost; a per-url hash salt spreads each bucket uniformly over
partitions. ``repartitionByRange(n, bucket, salt)`` gives partitions that
are homogeneous in document size (so Arrow batches have near-constant cost)
while the salt keeps every partition fed from every bucket range — no hot
partition, no driver-side sizing.

All downstream stages (extract mapInPandas, classifier join) are
partitioning-agnostic, so this single repartition fixes the whole pipeline's
task-time distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_length_bucket(pages: DataFrame, col: str = "html") -> DataFrame:
    return pages.withColumn(
        "_len_bucket",
        F.floor(F.log2(F.greatest(F.octet_length(F.col(col)), F.lit(1)))).cast("int"),
    )


def repartition_pages(
    pages: DataFrame, num_partitions: int, salt_buckets: int = 64
) -> DataFrame:
    """Length-bucketed + salted range repartition of the pages table."""
    bucketed = with_length_bucket(pages).withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).cast("int")
    )
    return bucketed.repartitionByRange(
        num_partitions, F.col("_len_bucket"), F.col("_salt")
    ).drop("_len_bucket", "_salt")


def partition_size_stats(pages: DataFrame) -> DataFrame:
    """Diagnostic: per-partition doc count and payload bytes (used by tests
    to assert the layout is balanced)."""
    return (
        pages.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("html")).alias("bytes_in"),
        )
    )
