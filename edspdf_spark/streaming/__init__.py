from edspdf_spark.streaming.stream import (
    read_pages_stream,
    run_pipeline_stream,
    windowed_ingest_metrics,
)

__all__ = ["read_pages_stream", "run_pipeline_stream", "windowed_ingest_metrics"]
