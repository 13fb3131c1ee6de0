"""Annotation visualization — the DATA half, Spark-first.

Reference ``edspdf/visualization/annotations.py:34-100`` renders label
rectangles onto pypdfium2 page images.  Neither pypdfium2 nor PIL ship in
this sandbox (and pixel rendering is a notebook concern, not an engine
one), so the split is:

- :func:`annotation_overlay` — everything the renderer CONSUMES, computed
  relationally: per-document label→color assignment (first-occurrence
  order zipped against the CATEGORY20 palette, ``annotations.py:62-67``),
  the outline rectangle in pixel space (``x0*w - 2 … x1*w + 2``,
  ``annotations.py:76-80``) and the rank-text anchor
  (``-10 + x0*w, y0*h``, ``annotations.py:84-85``).  Pure column
  expressions + one per-url window — value-level oracle-checked.
- :func:`render_pages` — the pixel half, an import-gated declared stub.

CATEGORY20 is the public matplotlib "tab20"-derived palette the reference
inlines (``annotations.py:10-31``, even entries kept).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CATEGORY20 = [
    "#1f77b4",
    "#ff7f0e",
    "#2ca02c",
    "#98df8a",
    "#d62728",
    "#ff9896",
    "#9467bd",
    "#c5b0d5",
    "#8c564b",
    "#c49c94",
    "#e377c2",
    "#f7b6d2",
    "#7f7f7f",
    "#c7c7c7",
    "#bcbd22",
    "#dbdb8d",
    "#17becf",
    "#9edae5",
]


def annotation_overlay(
    blocs: DataFrame,
    page_width: float = 612.0,
    page_height: float = 792.0,
) -> DataFrame:
    """Append the renderer-facing columns to labeled blocs.

    - ``color``: the label's palette entry, assigned per DOCUMENT by first
      occurrence in reading order (the reference's
      ``dict.fromkeys([box.label ...])`` keeps first-occurrence order and
      ``zip`` TRUNCATES — labels beyond the 18-entry palette get NULL,
      mirroring the reference's missing-key behavior).
    - ``rect_x0/rect_y0/rect_x1/rect_y1``: the outline rectangle in pixel
      space, with the reference's ±2 px x-padding.
    - ``text_x/text_y``: the rank-text anchor.
    """
    w_lbl = Window.partitionBy("url", "label")
    w_doc = Window.partitionBy("url")
    first_seen = F.min(
        F.col("page_num").cast("long") * F.lit(1 << 31) + F.col("bloc_ord")
    ).over(w_lbl)
    lbl_rank = F.dense_rank().over(w_doc.orderBy(F.col("_first_seen")))
    palette = F.array(*[F.lit(c) for c in CATEGORY20])
    color = F.when(
        F.col("_lbl_rank") <= len(CATEGORY20),
        F.element_at(palette, F.col("_lbl_rank").cast("int")),
    )
    w, h = F.lit(float(page_width)), F.lit(float(page_height))
    return (
        blocs.withColumn("_first_seen", first_seen)
        .withColumn("_lbl_rank", lbl_rank)
        .withColumn("color", color)
        .withColumn("rect_x0", F.col("x0") * w - F.lit(2.0))
        .withColumn("rect_y0", F.col("y0") * h)
        .withColumn("rect_x1", F.col("x1") * w + F.lit(2.0))
        .withColumn("rect_y1", F.col("y1") * h)
        .withColumn("text_x", F.lit(-10.0) + F.col("x0") * w)
        .withColumn("text_y", F.col("y0") * h)
        .drop("_first_seen", "_lbl_rank")
    )


def render_pages(pdf: bytes, overlay_rows, colors=None):  # pragma: no cover
    """Pixel rendering — needs ``pypdfium2`` + ``PIL``, neither of which
    ships in this sandbox; the overlay DataFrame above carries every value
    this call would draw (reference ``annotations.py:60-100``)."""
    try:
        import pypdfium2  # noqa: F401
        from PIL import ImageDraw  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "render_pages needs pypdfium2/PIL (not in sandbox); consume "
            "annotation_overlay()'s columns with any renderer"
        ) from e
    raise NotImplementedError("pixel rendering is out of engine scope")
