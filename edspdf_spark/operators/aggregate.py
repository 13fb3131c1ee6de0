"""P6 simple-aggregator / P7 markdown-aggregator as a grouped-map stage.

``groupBy(url).applyInPandas`` — the BASELINE-mandated groupBy-url
aggregation. One shuffle by url (the only data-sized shuffle of the whole
pipeline), then each document is reconstituted independently inside an Arrow
batch by the exact-semantics kernel
(``edspdf_spark.kernel.aggregate.aggregate_doc`` ≙ reference
``edspdf/pipes/aggregators/simple.py:108-171``).

Ordered concat + exact ``np.median`` + span rebasing must be byte-exact,
which is why this stays a grouped kernel rather than a
``lead()``/``percentile`` SQL approximation (SURVEY.md P6 discussion).

At 100 TB: aggregation state is one document's lines (KBs); skew comes only
from giant documents, which the upstream length-bucketed repartition spreads;
AQE's skew-join/partition coalescing handles the groupBy residual.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import pandas as pd
from pyspark.sql import DataFrame

from edspdf_spark.kernel.aggregate import aggregate_doc
from edspdf_spark.schemas import AGG_SCHEMA

_AGG_COLS = [f.name for f in AGG_SCHEMA.fields]


def _props_to_tuples(props) -> list:
    if props is None:
        return []
    return [
        (p["italic"], p["bold"], int(p["begin"]), int(p["end"]), p["fontname"])
        for p in props
    ]


def aggregate_simple(
    blocs: DataFrame,
    sort: bool = False,
    new_line_threshold: float = 0.2,
    new_paragraph_threshold: float = 1.5,
    label_map: Optional[Dict[str, Union[str, List[str]]]] = None,
) -> DataFrame:
    """blocs → aggregates(url, label, text, properties)."""

    def per_doc(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp[~grp["error"]]
        if not len(grp):
            return pd.DataFrame(columns=_AGG_COLS)
        # document reading order = (page_num asc, per-page fuzzy rank asc)
        grp = grp.sort_values(["page_num", "bloc_ord"], kind="stable")
        url = grp["url"].iloc[0]
        lines = [
            (
                int(r.page_num),
                float(r.x0),
                float(r.y0),
                float(r.x1),
                float(r.y1),
                r.text,
                _props_to_tuples(r.props),
                r.label,
            )
            for r in grp.itertuples(index=False)
        ]
        agg = aggregate_doc(
            lines,
            sort=sort,
            new_line_threshold=new_line_threshold,
            new_paragraph_threshold=new_paragraph_threshold,
            label_map=label_map,
        )
        rows = [
            {
                "url": url,
                "label": label,
                "text": text,
                "properties": [
                    {
                        "italic": s[0],
                        "bold": s[1],
                        "begin": s[2],
                        "end": s[3],
                        "fontname": s[4],
                    }
                    for s in styles
                ],
            }
            for label, (text, styles) in agg.items()
        ]
        return pd.DataFrame(rows, columns=_AGG_COLS)

    return blocs.groupBy("url").applyInPandas(per_doc, schema=AGG_SCHEMA)


def to_markdown(text: str, properties: list) -> str:
    """P7 markdown recipe (reference
    ``tests/recipes/test_markdown_aggregator.py:6-36`` semantics): wrap bold
    spans in ``**…**`` and italic in ``_…_``, processing spans right-to-left
    so earlier offsets stay valid."""
    frags = []
    for p in properties:
        bold = bool(p["bold"]) if p["bold"] is not None else False
        italic = bool(p["italic"]) if p["italic"] is not None else False
        if bold or italic:
            frags.append((int(p["begin"]), int(p["end"]), bold, italic))
    out = text
    for begin, end, bold, italic in sorted(frags, key=lambda f: f[0], reverse=True):
        piece = out[begin:end]
        if bold:
            piece = f"**{piece}**"
        if italic:
            piece = f"_{piece}_"
        out = out[:begin] + piece + out[end:]
    return out


def aggregate_markdown(blocs: DataFrame, **kwargs) -> DataFrame:
    """P7: simple aggregation, then markdown-decorate the text per row."""
    import pandas as pd  # noqa: F811 — re-import for the UDF closure

    agg = aggregate_simple(blocs, **kwargs)

    def decorate(batches):
        for pdf in batches:
            if len(pdf):
                pdf = pdf.assign(
                    text=[
                        to_markdown(t, props if props is not None else [])
                        for t, props in zip(pdf["text"], pdf["properties"])
                    ]
                )
            yield pdf

    return agg.mapInPandas(decorate, schema=AGG_SCHEMA)
