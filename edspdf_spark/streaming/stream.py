"""Structured Streaming ingest for the pages pipeline.

The reference is batch-only (SURVEY.md §2.6); a Common-Crawl-scale ingest
is naturally a stream of WARC drops. Two patterns:

* ``run_pipeline_stream`` — file-source stream over a pages parquet
  directory, full extract → classify → aggregate per micro-batch via
  ``foreachBatch`` (the per-document aggregation has no cross-batch state:
  one document never spans WARC files, so batch == complete-document set;
  this keeps the grouped-map aggregator usable unchanged and the sink
  idempotent by batch id).
* ``windowed_ingest_metrics`` — a genuinely stateful streaming aggregation:
  doc/byte counts per (1-minute warc_ts window, lang) with a watermark for
  late arrivals — the streaming face of the metrics table.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edspdf_spark.schemas import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_pipeline_stream(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    masks=None,
    threshold: float = 0.1,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
    trigger_available_now: bool = True,
):
    """Stream → extract → classify → aggregate → parquet, exactly-once per
    micro-batch (checkpointed batch ids + idempotent per-batch overwrite
    into batch-partitioned output)."""
    from edspdf_spark.operators import aggregate_simple, classify_mask, extract_blocs

    masks = masks or [("body", 0.0, 0.0, 1.0, 1.0)]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        blocs = extract_blocs(batch_df)
        labeled = classify_mask(blocs, masks, threshold=threshold)
        agg = aggregate_simple(labeled).withColumn("batch_id", F.lit(batch_id))
        # idempotent on retry: replace this batch's partition only
        agg.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(out_dir)

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_ingest_metrics(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 minutes",
    window: str = "1 minute",
    trigger_available_now: bool = True,
):
    """Watermarked windowed aggregation: docs/bytes per (window, lang)."""
    agg = (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("html")).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_docs",
            "bytes_in",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
