"""Edge inputs: unicode payloads, giant documents, pathological whitespace."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from edspdf_spark.fixtures import PAGE_H, PAGE_W
from edspdf_spark.kernel.payload import encode_run, extract_doc


def _page(lines):
    out = [f"PAGE 0 {PAGE_W} {PAGE_H}"]
    for j, (font, upright, text) in enumerate(lines):
        y1 = PAGE_H - 40.0 - j * 20.0
        out.append(f"LINE 50.0 {y1 - 11.0} 450.0 {y1} " + encode_run(font, upright, text))
    return ("\n".join(out) + "\n").encode("utf-8")


def test_unicode_roundtrip_kernel():
    payload = _page(
        [
            ("Helvetica", True, "héllo wörld"),
            ("Courier", True, "中文 текст £€ ¥"),
            ("Times-Italic", True, "mixed ascii ünd ünïcode"),
        ]
    )
    blocs, pages, err = extract_doc(payload)
    assert not err
    texts = [b["text"] for b in blocs]
    assert texts == ["héllo wörld", "中文 текст £€ ¥", "mixed ascii ünd ünïcode"]
    # style spans index by CODEPOINT offsets into the python string
    assert blocs[1]["props"][0]["end"] == len("中文 текст £€ ¥")


def test_unicode_whitespace_folds():
    # NBSP and ideographic space are \s in python — must collapse to ' '
    payload = _page([("Helvetica", True, "a b"), ("Helvetica", True, "c　 d")])
    blocs, _, err = extract_doc(payload)
    assert not err
    assert [b["text"] for b in blocs] == ["a b", "c d"]


def test_unicode_through_spark_pipeline(spark):
    from edspdf_spark.operators import aggregate_simple, classify_mask, extract_blocs, run_pipeline_fused

    rows = [("u·1", _page([("Helvetica", True, "héllo wörld"), ("Courier", True, "中文 текст")]))]
    pages = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    composed = aggregate_simple(
        classify_mask(extract_blocs(pages), [("body", 0.0, 0.0, 1.0, 1.0)], 0.1)
    ).collect()
    fused = run_pipeline_fused(pages, [("body", 0.0, 0.0, 1.0, 1.0)], 0.1).collect()
    assert len(composed) == 1 and composed[0].text == "héllo wörld\n\n中文 текст"
    assert composed[0].text == fused[0].text and composed[0].url == "u·1"


def test_giant_document_single_task(spark):
    """A 500-page document must flow through extract + aggregate without
    splitting mid-document (the carry-buffer path in the streaming
    aggregator spans many Arrow batches for one url)."""
    from edspdf_spark.operators import aggregate_simple, classify_mask, extract_blocs

    out = []
    n_pages, lines_per_page = 500, 20
    for p in range(n_pages):
        out.append(f"PAGE {p} {PAGE_W} {PAGE_H}")
        for j in range(lines_per_page):
            y1 = PAGE_H - 40.0 - j * 20.0
            out.append(
                f"LINE 50.0 {y1 - 11.0} 450.0 {y1} " + encode_run("Helvetica", True, f"p{p} l{j}")
            )
    payload = ("\n".join(out) + "\n").encode()
    pages = spark.createDataFrame(pd.DataFrame([("giant", payload)], columns=["url", "html"]))
    blocs = extract_blocs(pages)
    assert blocs.count() == n_pages * lines_per_page
    agg = aggregate_simple(
        classify_mask(blocs, [("body", 0.0, 0.0, 1.0, 1.0)], 0.1)
    ).collect()
    assert len(agg) == 1
    text = agg[0].text
    assert text.startswith("p0 l0") and text.endswith("p499 l19")
    assert text.count("\n\n") == n_pages * lines_per_page - 1
