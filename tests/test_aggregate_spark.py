"""Simple/markdown aggregator as grouped-map stages — reference fixtures.

Re-expresses /root/reference/tests/pipes/aggregators/test_simple.py and the
markdown recipe as DataFrame-level assertions.
"""

from __future__ import annotations

from edspdf_spark.operators.aggregate import aggregate_markdown, aggregate_simple
from edspdf_spark.schemas import BLOC_SCHEMA


def _no_style_blocs(spark):
    rows = [
        ("doc", 0, 0, 0.1, 0.1, 0.5, 0.2, "Begin", [], "body", False),
        ("doc", 0, 1, 0.6, 0.1, 0.7, 0.2, "and", [], "body", False),
        ("doc", 0, 2, 0.8, 0.1, 0.9, 0.2, "end.", [], "body", False),
        ("doc", 1, 0, 0.8, 0.1, 0.9, 0.2, "New page", [], "body", False),
    ]
    return spark.createDataFrame(rows, BLOC_SCHEMA)


def test_reference_no_style(spark):
    out = aggregate_simple(_no_style_blocs(spark)).collect()
    assert len(out) == 1
    assert out[0].label == "body"
    assert out[0].text == "Begin and end.\n\nNew page"


def test_label_map(spark):
    out = {
        r.label: r.text
        for r in aggregate_simple(
            _no_style_blocs(spark), label_map={"text": ["body"], "other": ["x"]}
        ).collect()
    }
    assert out == {"text": "Begin and end.\n\nNew page", "other": ""}


def test_span_rebasing_spark(spark):
    props_a = [{"italic": False, "bold": True, "begin": 0, "end": 5, "fontname": "F-Bold"}]
    props_b = [{"italic": True, "bold": False, "begin": 0, "end": 3, "fontname": "F-It"}]
    rows = [
        ("doc", 0, 0, 0.1, 0.1, 0.5, 0.2, "Begin", props_a, "body", False),
        ("doc", 0, 1, 0.6, 0.1, 0.7, 0.2, "and", props_b, "body", False),
    ]
    blocs = spark.createDataFrame(rows, BLOC_SCHEMA)
    out = aggregate_simple(blocs).collect()[0]
    assert out.text == "Begin and"
    p0, p1 = out.properties
    assert (p0.begin, p0.end, p0.bold) == (0, 5, True)
    assert (p1.begin, p1.end, p1.italic) == (6, 9, True)
    assert out.properties[0].begin == 0  # reference invariant


def test_markdown(spark):
    props = [
        {"italic": False, "bold": True, "begin": 0, "end": 5, "fontname": "F-Bold"},
        {"italic": True, "bold": False, "begin": 6, "end": 9, "fontname": "F-It"},
    ]
    rows = [("doc", 0, 0, 0.1, 0.1, 0.5, 0.2, "Begin and", props, "body", False)]
    blocs = spark.createDataFrame(rows, BLOC_SCHEMA)
    out = aggregate_markdown(blocs).collect()[0]
    assert out.text == "**Begin** _and_"


def test_error_only_doc_produces_no_aggregate(spark):
    rows = [("bad", None, None, None, None, None, None, None, [], None, True)]
    blocs = spark.createDataFrame(rows, BLOC_SCHEMA)
    assert aggregate_simple(blocs).count() == 0
