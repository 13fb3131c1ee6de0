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


def _hex_to_rgb(color: str):
    c = color.lstrip("#")
    return tuple(int(c[i : i + 2], 16) for i in (0, 2, 4))


def render_pages(pdf_bytes: bytes, overlay_rows=None, dpi: int = 200):
    """Deterministic page rasterizer — the structural half of the
    reference's pypdfium2 render (``pipes/extractors/pdfminer.py:186-192``
    + ``visualization/annotations.py:60-100``).

    Returns one ``uint8 ndarray (H, W, 3)`` per page with the EXACT
    pypdfium2 geometry (``scale = dpi/72``, dimensions rounded like
    pdfium's bitmap: ``int(w*scale + 0.5)`` — test.pdf at 200 dpi →
    (2339, 1654, 3), matching the reference's image-shape test): white
    page, extracted text lines drawn as gray boxes, and, when
    ``overlay_rows`` (the :func:`annotation_overlay` columns as dicts) are
    given, their label colors drawn as 2-px outline rectangles. Glyph-
    accurate rasterization would need pypdfium2 (not in this sandbox) —
    this keeps the shape/scale/overlay plumbing real and testable.
    """
    import numpy as np

    from edspdf_spark.kernel.payload import extract_doc

    blocs, pages, error = extract_doc(pdf_bytes)
    scale = dpi / 72.0
    images = []
    by_page: dict = {}
    for b in blocs:
        by_page.setdefault(b["page_num"], []).append(b)
    overlays: dict = {}
    for r in overlay_rows or []:
        overlays.setdefault(r.get("page_num", 0), []).append(r)

    for page_num, width, height in pages:
        w_px = int(width * scale + 0.5)
        h_px = int(height * scale + 0.5)
        img = np.full((h_px, w_px, 3), 255, dtype=np.uint8)

        def clip_x(v):
            return max(0, min(w_px, int(v)))

        def clip_y(v):
            return max(0, min(h_px, int(v)))

        for b in by_page.get(page_num, []):
            x0, x1 = clip_x(b["x0"] * w_px), clip_x(b["x1"] * w_px)
            y0, y1 = clip_y(b["y0"] * h_px), clip_y(b["y1"] * h_px)
            img[y0:y1, x0:x1] = 64  # text line → gray box stand-in

        for r in overlays.get(page_num, []):
            color = r.get("color")
            if not color:
                continue
            rgb = np.array(_hex_to_rgb(color), dtype=np.uint8)
            x0 = clip_x(r["rect_x0"] * scale)
            x1 = clip_x(r["rect_x1"] * scale)
            y0 = clip_y(r["rect_y0"] * scale)
            y1 = clip_y(r["rect_y1"] * scale)
            t = 2  # outline thickness (reference stroke width)
            img[y0 : min(y0 + t, h_px), x0:x1] = rgb
            img[max(y1 - t, 0) : y1, x0:x1] = rgb
            img[y0:y1, x0 : min(x0 + t, w_px)] = rgb
            img[y0:y1, max(x1 - t, 0) : x1] = rgb
        images.append(img)
    if error:
        return []
    return images
