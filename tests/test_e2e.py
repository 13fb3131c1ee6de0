"""End-to-end: synthetic corpus → extract → mask-classify → aggregate.

The distributed result must match, byte-for-byte, a driver-local per-document
oracle built from the same exact-semantics kernels plus the NumPy alignment
kernel (itself validated against the reference's golden unit fixtures in
test_kernel.py). This checks the Spark plumbing — broadcast-join + window
argmax, groupBy url, Arrow struct round-trips — not just the math.
"""

from __future__ import annotations

import numpy as np
import pytest

from edspdf_spark.fixtures import build_pages_df, gen_doc
from edspdf_spark.kernel.aggregate import aggregate_doc
from edspdf_spark.kernel.overlap import align_labels_kernel
from edspdf_spark.kernel.payload import extract_doc
from edspdf_spark.operators.aggregate import aggregate_simple
from edspdf_spark.operators.classify import classify_mask
from edspdf_spark.operators.extract import extract_blocs

N_DOCS = 120
MASKS = [("body", 0.2, 0.3, 0.9, 0.6)]
THRESHOLD = 0.1


def oracle_doc(i: int):
    """Reference-semantics pipeline for one document, driver-local."""
    doc = gen_doc(i)
    blocs, _pages, error = extract_doc(doc["html"])
    if error:
        return doc["url"], None, True
    # mask classify: user masks + pollution(±1e4) + align catch-all(None)
    if blocs:
        dst = np.array([[b["x0"], b["x1"], b["y0"], b["y1"]] for b in blocs])
        src = np.array(
            [[m[1], m[3], m[2], m[4]] for m in MASKS] + [[-1e4, 1e4, -1e4, 1e4]]
        )
        idx = align_labels_kernel(src, dst, threshold=THRESHOLD)
        label_vocab = [m[0] for m in MASKS] + ["pollution", None]
        for b, j in zip(blocs, idx):
            b["label"] = label_vocab[j]
    lines = [
        (
            b["page_num"],
            b["x0"],
            b["y0"],
            b["x1"],
            b["y1"],
            b["text"],
            [(p["italic"], p["bold"], p["begin"], p["end"], p["fontname"]) for p in b["props"]],
            b["label"],
        )
        for b in blocs
    ]
    return doc["url"], aggregate_doc(lines), False


@pytest.fixture(scope="module")
def spark_result(spark):
    pages = build_pages_df(spark, N_DOCS, partitions=8)
    blocs = extract_blocs(pages)
    labeled = classify_mask(blocs, MASKS, threshold=THRESHOLD)
    agg = aggregate_simple(labeled)
    rows = agg.collect()
    out = {}
    for r in rows:
        out.setdefault(r.url, {})[r.label] = (
            r.text,
            [(p.italic, p.bold, p.begin, p.end, p.fontname) for p in r.properties],
        )
    return out


def test_byte_identical_text_per_url(spark_result):
    n_checked = 0
    for i in range(N_DOCS):
        url, oracle, error = oracle_doc(i)
        if error or oracle is None:
            assert url not in spark_result or spark_result[url] == {}
            continue
        got = spark_result.get(url, {})
        assert set(got.keys()) == set(oracle.keys()), url
        for label, (otext, ostyles) in oracle.items():
            gtext, gstyles = got[label]
            assert gtext == otext, f"{url}/{label}: text mismatch"
            assert gstyles == [tuple(s) for s in ostyles], f"{url}/{label}: styles"
            n_checked += 1
    assert n_checked > 100  # the corpus really produced aggregates


def test_extract_counts_and_errors(spark):
    pages = build_pages_df(spark, N_DOCS, partitions=8)
    blocs = extract_blocs(pages).cache()
    try:
        total = blocs.count()
        n_err_docs = blocs.filter("error").select("url").distinct().count()
        expected_err = sum(1 for i in range(N_DOCS) if i % 501 == 500)
        assert n_err_docs == expected_err
        # independent count from the oracle
        expected_blocs = sum(
            len(extract_doc(gen_doc(i)["html"])[0]) for i in range(N_DOCS)
        )
        assert total - n_err_docs == expected_blocs
    finally:
        blocs.unpersist()
