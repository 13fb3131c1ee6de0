"""Pure-Python/NumPy kernels with the reference's exact semantics.

These are deliberately Spark-free so they can be unit-tested directly and
reused both inside vectorized pandas UDFs (the distributed hot path) and in
the test oracle. Every function documents the reference file:line it mirrors.
"""

from edspdf_spark.kernel.reading_order import reading_order_lt, sort_reading_order
from edspdf_spark.kernel.style import fold_line_chars
from edspdf_spark.kernel.payload import parse_payload, extract_doc
from edspdf_spark.kernel.overlap import align_labels_kernel
from edspdf_spark.kernel.aggregate import aggregate_doc

__all__ = [
    "reading_order_lt",
    "sort_reading_order",
    "fold_line_chars",
    "parse_payload",
    "extract_doc",
    "align_labels_kernel",
    "aggregate_doc",
]
