"""E1 — box layout features as plain column expressions.

Reference ``edspdf/pipes/embeddings/box_layout_preprocessor.py:25-95``
computes per-line features xmin/ymin/xmax/ymax/width/height/first_page/
last_page. Pure projections + one window per url — fully whole-stage
codegen; this is the feature vector of the forest classifier (P8, SURVEY.md
§2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FEATURE_COLS = [
    "f_xmin",
    "f_ymin",
    "f_xmax",
    "f_ymax",
    "f_width",
    "f_height",
    "f_first_page",
    "f_last_page",
    "f_page_num",
    "f_n_chars",
]


def with_layout_features(blocs: DataFrame) -> DataFrame:
    """Append the E1 feature columns (plus page_num / n_chars used by the
    forest classifier)."""
    w = Window.partitionBy("url")
    return (
        blocs.withColumn("f_xmin", F.col("x0"))
        .withColumn("f_ymin", F.col("y0"))
        .withColumn("f_xmax", F.col("x1"))
        .withColumn("f_ymax", F.col("y1"))
        .withColumn("f_width", F.col("x1") - F.col("x0"))
        .withColumn("f_height", F.col("y1") - F.col("y0"))
        .withColumn(
            "f_first_page",
            (F.col("page_num") == F.min("page_num").over(w)).cast("double"),
        )
        .withColumn(
            "f_last_page",
            (F.col("page_num") == F.max("page_num").over(w)).cast("double"),
        )
        .withColumn("f_page_num", F.col("page_num").cast("double"))
        .withColumn("f_n_chars", F.length("text").cast("double"))
    )
