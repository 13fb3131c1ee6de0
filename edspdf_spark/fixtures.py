"""Deterministic synthetic pages corpus (FIXTURES.md §1).

Each document is generated from ``numpy.random.default_rng(42 + i)`` only —
no global state — so the corpus is identical no matter how generation is
partitioned. ``build_pages_df`` generates the corpus DISTRIBUTED
(``spark.range(n).mapInPandas``): at bench scale nothing funnels through the
driver.

Skew injection (FIXTURES.md): every 97th doc has 50× pages (exercises the
length-bucketed salted repartition, SURVEY.md §7.1 step 7); every 501st doc
is corrupt (exercises the error path, reference pdfminer.py:130-135).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

import numpy as np
import pandas as pd

from edspdf_spark.kernel.payload import encode_run
from edspdf_spark.schemas import PAGES_SCHEMA

_EPOCH = _dt.datetime(2024, 1, 1)
_LANGS = ["en", "en", "fr", "de", "en"]
_FONTS = [
    "Helvetica",
    "Helvetica-Bold",
    "Times-Italic",
    "Times-BoldItalic",
    "Courier",
]
_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()

PAGE_W, PAGE_H = 612.0, 792.0


def _gen_line_text(rng: np.random.Generator) -> str:
    words = rng.choice(_WORDS, size=int(rng.integers(2, 9)))
    text = " ".join(words)
    r = rng.random()
    if r < 0.03:  # leading whitespace — must fold away
        text = "  " + text
    elif r < 0.05:  # inner double space / tab — must collapse
        mid = len(text) // 2
        text = text[:mid] + ("\t " if r < 0.04 else "  ") + text[mid:]
    return text


def gen_doc(i: int) -> dict:
    rng = np.random.default_rng(42 + i)
    url = f"https://synth.test/{i:08d}"
    warc_ts = _EPOCH + _dt.timedelta(seconds=int(i) * 137)
    lang = _LANGS[i % len(_LANGS)]

    if i % 501 == 500:
        return {
            "url": url,
            "warc_ts": warc_ts,
            "html": b"CORRUPT\n",
            "text": "",
            "lang": lang,
        }

    n_pages = int(rng.integers(1, 5))
    if i % 97 == 96:
        n_pages *= 50  # skewed giant document

    out_lines: list[str] = []
    plain_parts: list[str] = []
    for page_num in range(n_pages):
        out_lines.append(f"PAGE {page_num} {PAGE_W} {PAGE_H}")
        n_lines = int(rng.integers(5, 41))
        # Draw line geometry top-to-bottom, then emit in shuffled order so
        # the reading-order sort in the extractor is actually exercised.
        lines = []
        y_top = PAGE_H - 40.0
        for _ in range(n_lines):
            h = float(rng.uniform(9.0, 14.0))
            gap = float(rng.choice([2.0, 3.0, 14.0, 40.0], p=[0.55, 0.25, 0.12, 0.08]))
            y1 = y_top
            y0 = y1 - h
            x0 = float(rng.uniform(30.0, 90.0))
            x1 = x0 + float(rng.uniform(150.0, PAGE_W - x0 - 20.0))
            y_top = y0 - gap
            text = _gen_line_text(rng)
            if rng.random() < 0.10:  # out of bounds — must be dropped
                x1 = PAGE_W + float(rng.uniform(1.0, 50.0))
            if rng.random() < 0.20:  # multi-style run
                cut = max(1, len(text) // 2)
                f1, f2 = rng.choice(_FONTS, size=2)
                upright1 = bool(rng.random() > 0.1)
                runs = [
                    encode_run(str(f1), upright1, text[:cut]),
                    encode_run(str(f2), True, text[cut:]),
                ]
            else:
                f = str(rng.choice(_FONTS))
                runs = [encode_run(f, True, text)]
            lines.append(f"LINE {x0:.4f} {y0:.4f} {x1:.4f} {y1:.4f} " + "|".join(runs))
            plain_parts.append(text)
        order = rng.permutation(len(lines))
        out_lines.extend(lines[j] for j in order)

    payload = "\n".join(out_lines) + "\n"
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": payload.encode("utf-8"),
        "text": " ".join(plain_parts),
        "lang": lang,
    }


def gen_docs_pandas(indices) -> pd.DataFrame:
    rows = [gen_doc(int(i)) for i in indices]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


def build_pages_df(spark, n: int, partitions: int | None = None):
    """Distributed deterministic corpus of n pages as a Spark DataFrame."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_docs_pandas(pdf["id"].to_numpy())

    rng_df = spark.range(n, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_corpus(spark, path: str, n: int, partitions: int | None = None) -> None:
    build_pages_df(spark, n, partitions).write.mode("overwrite").parquet(path)


def _doc_to_payload(doc_id: int, text: str) -> bytes:
    """Deterministically lay a document's words out as a layout payload:
    6 words per line, 12 lines per page, top-down; fonts cycle by line."""
    words = (text or "").split()
    lines = [" ".join(words[i : i + 6]) for i in range(0, len(words), 6)] or [""]
    out = []
    per_page = 12
    for p in range(0, len(lines), per_page):
        page_num = p // per_page
        out.append(f"PAGE {page_num} {PAGE_W} {PAGE_H}")
        for j, line in enumerate(lines[p : p + per_page]):
            if not line:
                continue
            y1 = PAGE_H - 40.0 - j * 20.0
            y0 = y1 - 11.0
            font = _FONTS[(doc_id + j) % len(_FONTS)]
            out.append(
                f"LINE 50.0 {y0} 450.0 {y1} " + encode_run(font, True, line)
            )
    return ("\n".join(out) + "\n").encode("utf-8")


def _doc_to_html(doc_id: int, text: str) -> bytes:
    """Deterministic Common-Crawl-style page: nav chrome, a link-dense ad
    block, article paragraphs separated by short connectives, related-links
    aside, footer — exercises block segmentation, chrome depth, link
    density, and the jusText-style context pass."""
    words = (text or "").split()
    third = max(1, (len(words) + 2) // 3)
    paras = [" ".join(words[i : i + third]) for i in range(0, len(words), third)]
    links = " ".join(
        f"<a href='/t/{(doc_id + k) % 97}'>tag{k}</a>" for k in range(6)
    )
    body = "<p>Read on</p>".join(
        f"<h2>Part {j}</h2><p>{p}</p>" for j, p in enumerate(paras)
    )
    return (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>Archive</a>"
        " <a href='/c'>Contact</a></nav>"
        f"<div>{links}</div>"
        f"<article><h1>Doc {doc_id}</h1>{body}"
        f"<ul><li>point {doc_id % 11}<li>point {(doc_id + 1) % 11}</ul>"
        f"<pre><code class='language-python'>v = {doc_id % 13}</code></pre>"
        "</article>"
        "<aside><a href='/x'>More</a> <a href='/y'>Related</a></aside>"
        "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a></footer>"
        "</body></html>"
    ).encode("utf-8")


def html_page_batch(pdf: pd.DataFrame, reps: int = 1) -> pd.DataFrame:
    """Pandas-batch half of :func:`html_pages_from_documents` —
    ``(doc_id, text)`` rows → ``(url, html)`` pages. Importable so
    Arrow-stage consumers (``extract_blocs_consensus(page_builder=...)``)
    can run the synthesis INSIDE their own stage instead of stacking a
    second ``MapInPandas`` under it."""
    rows = []
    for r in pdf.itertuples(index=False):
        for rep in range(reps):
            did = int(r.doc_id) + rep * 1_000_000
            rows.append(
                {"url": f"web://{did:09d}", "html": _doc_to_html(did, r.text)}
            )
    return pd.DataFrame(rows, columns=["url", "html"])


def html_pages_from_documents(spark, sf_dir: str, reps: int = 1):
    """documents table → (url, html) web-page corpus; ``reps`` replicates
    the texts under distinct urls for bench-scale workloads."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield html_page_batch(pdf, reps)

    return docs.mapInPandas(gen, schema="url string, html binary")


def pages_from_documents(spark, sf_dir: str):
    """Adapter: the driver's ``documents`` table → a deterministic pages
    table (BASELINE input_hint shape), used by the flagship entry query."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "url": f"doc://{int(r.doc_id):08d}",
                    "warc_ts": _EPOCH + _dt.timedelta(seconds=int(r.doc_id) * 137),
                    "html": _doc_to_payload(int(r.doc_id), r.text),
                    "text": r.text,
                    "lang": r.lang,
                }
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES_SCHEMA)
