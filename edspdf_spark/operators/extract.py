"""P1+P2 — payload → text-bloc rows, as a vectorized ``mapInPandas`` stage.

Spark-first re-expression of the reference extractor
(``edspdf/pipes/extractors/pdfminer.py:117-194``): the binary parse cannot be
SQL, but everything around it is batch-vectorized — one Arrow batch of pages
in, one Arrow batch of bloc rows out; normalization, bounds filter, style
fold and the per-page fuzzy reading-order sort all happen inside the same
batch with zero extra shuffles. Catalyst still prunes/pushes the scan below
this stage (only ``url`` and ``html`` are read).

Error containment: a document that fails to parse emits one sentinel row
with ``error=true`` (reference sets ``doc.error=True`` and zero boxes,
pdfminer.py:130-135). Spark task retries would retry a whole partition;
per-document try/except keeps one poison doc from sinking 10k neighbors
(SURVEY.md §4).

At 100 TB: this stage is embarrassingly parallel — throughput scales with
executors provided partitions are size-balanced, which is the job of
``edspdf_spark.skew.repartition_pages`` upstream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from edspdf_spark.kernel.payload import extract_doc_raw
from edspdf_spark.schemas import BLOC_SCHEMA

_BLOC_COLS = [f.name for f in BLOC_SCHEMA.fields]


def _extract_batches(
    batches: Iterator[pd.DataFrame], extract_style: bool
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        urls = pdf["url"].to_numpy()
        htmls = pdf["html"].to_numpy()
        for url, html in zip(urls, htmls):
            # tuple-native kernel; only the props structs stay dicts (the
            # Arrow struct converter consumes mappings)
            blocs, _pages, error = extract_doc_raw(html)
            if error:
                rows.append(
                    (url, None, None, None, None, None, None, None, [], None, True)
                )
                continue
            for b in blocs:
                props = (
                    [
                        {
                            "italic": s[0],
                            "bold": s[1],
                            "begin": s[2],
                            "end": s[3],
                            "fontname": s[4],
                        }
                        for s in b[7]
                    ]
                    if extract_style
                    else []
                )
                rows.append(
                    (url, b[0], b[1], b[2], b[3], b[4], b[5], b[6], props, None, False)
                )
        yield pd.DataFrame(rows, columns=_BLOC_COLS)


def extract_blocs(pages: DataFrame, extract_style: bool = True) -> DataFrame:
    """pages(url, html, …) → blocs (BLOC_SCHEMA), reading-order sorted.

    Narrows the input to (url, html) first so Catalyst prunes every other
    column at the scan (``ReadSchema`` shows only the two columns).
    """
    narrowed = pages.select("url", "html")
    return narrowed.mapInPandas(
        lambda it: _extract_batches(it, extract_style),
        schema=BLOC_SCHEMA,
    )
