from edspdf_spark.sources.readers import (
    read_pages_parquet,
    read_files_binary,
    from_pandas,
    from_iterable,
)
from edspdf_spark.sources.writers import (
    write_parquet,
    to_pandas,
    to_iterable,
    write_files,
)
from edspdf_spark.sources.resume import ResumableSink

__all__ = [
    "read_pages_parquet",
    "read_files_binary",
    "from_pandas",
    "from_iterable",
    "write_parquet",
    "to_pandas",
    "to_iterable",
    "write_files",
    "ResumableSink",
]
