"""Cross-extractor consensus voting (`consensus_line_votes` /
`extract_blocs_consensus`): a line is content only when ≥ min_votes of the
three HTML faces (jusText / readability / boilerpipe) agree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edspdf_spark.operators.extract_html import (
    consensus_line_votes,
    extract_blocs_consensus,
)

# A page all three faces can parse: a link-only nav (all faces:
# boilerplate), a long lead paragraph (all faces: body), and a short
# trailing paragraph (faces disagree — jusText context smoothing may keep
# it, boilerpipe's prev>4-words rescue keeps it, readability keeps only
# the winning container's prose).
LEAD = (
    "The quick brown fox jumps over the lazy dog while the patient editor "
    "counts every single word in this deliberately long lead paragraph so "
    "that the shallow text feature classifier marks it as proper long form "
    "article content without any doubt whatsoever."
)
PAGE = (
    "<html><body>"
    "<nav><a href='/'>Home</a> <a href='/a'>About</a> "
    "<a href='/c'>Contact</a></nav>"
    "<div class='content'><p>" + LEAD + "</p>"
    "<p>Second paragraph of the story, also real content here.</p></div>"
    "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a></footer>"
    "</body></html>"
).encode("utf-8")


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame([("u0", PAGE)], "url string, html binary")


def test_votes_shape_and_lead_consensus(pages):
    from edspdf_spark.operators.extract_html import (
        extract_blocs_boilerpipe,
        extract_blocs_html,
        extract_blocs_readability,
    )

    legs = {
        "justext": extract_blocs_html(pages),
        "readability": extract_blocs_readability(pages),
        "boilerpipe": extract_blocs_boilerpipe(pages),
    }
    votes = {
        r["line"]: r["votes"] for r in consensus_line_votes(legs).collect()
    }
    assert votes.get(LEAD, 0) >= 2, votes
    # nav chrome must never reach 2 votes
    for line, v in votes.items():
        if "Home" in line or "Privacy" in line:
            assert v <= 1, (line, v)


def test_consensus_blocs(pages):
    out = extract_blocs_consensus(pages, min_votes=2)
    rows = out.collect()
    body = [r for r in rows if r.label == "body"]
    assert any(LEAD in (r.text or "") for r in body)
    # chrome lines never in a body bloc
    for r in body:
        assert "Home" not in r.text and "Privacy" not in r.text
    # non-body blocs pass through with schema intact
    assert out.columns == [
        "url", "page_num", "bloc_ord", "x0", "y0", "x1", "y1",
        "text", "props", "label", "error",
    ]


def test_min_votes_3_is_stricter(pages):
    n2 = extract_blocs_consensus(pages, min_votes=2).where(
        F.col("label") == "body"
    ).count()
    n3 = extract_blocs_consensus(pages, min_votes=3).where(
        F.col("label") == "body"
    ).count()
    assert n3 <= n2


def test_error_pages_pass_through(spark):
    df = spark.createDataFrame(
        [("bad", None)], "url string, html binary"
    )
    rows = extract_blocs_consensus(df, min_votes=2).collect()
    assert len(rows) == 1 and rows[0].error


def test_fused_kernel_matches_distributed_votes(spark):
    """The fused single-stage kernel must reproduce the distributed
    reference exactly: every output body line has >= min_votes in
    consensus_line_votes, and every jusText body line with enough votes
    appears in the output (same blocs, same order, same text)."""
    from edspdf_spark.operators.extract_html import (
        extract_blocs_boilerpipe,
        extract_blocs_html,
        extract_blocs_readability,
    )

    pages_rows = [
        ("p0", PAGE),
        (
            "p1",
            (
                "<html><nav><a href='/'>Menu</a> Home About</nav><article>"
                "<p>A first real paragraph with plenty of ordinary words to "
                "be counted as good body content by every face.</p>"
                "<p>Read on</p>"
                "<p>A second real paragraph, also long enough for all of the "
                "extraction heuristics to keep it.</p></article>"
                "<footer><a href='/p'>Privacy</a></footer></html>"
            ).encode(),
        ),
        ("p2", b"no markup at all"),  # parse error page
    ]
    pages = spark.createDataFrame(pages_rows, "url string, html binary")
    kw = dict(min_words=3, max_link_density=0.4, context_sensitive=True)

    jus = extract_blocs_html(pages, **kw)
    legs = {
        "justext": jus,
        "readability": extract_blocs_readability(pages),
        "boilerpipe": extract_blocs_boilerpipe(pages),
    }
    votes = {
        (r["url"], r["line"]): r["votes"]
        for r in consensus_line_votes(legs).collect()
    }
    out = extract_blocs_consensus(pages, min_votes=2, **kw).collect()

    # reference reconstruction from the jus leg + distributed votes
    expected = []
    for r in jus.collect():
        if r.error:
            expected.append((r.url, None, None, None, True))
            continue
        if r.label == "body":
            kept = [
                ln
                for ln in r.text.split("\n")
                if votes.get((r.url, ln), 0) >= 2
            ]
            if not kept:
                continue
            expected.append((r.url, r.page_num, r.bloc_ord, "\n".join(kept), False))
        else:
            expected.append((r.url, r.page_num, r.bloc_ord, r.text, False))
    got = [(r.url, r.page_num, r.bloc_ord, r.text, r.error) for r in out]
    assert sorted(got, key=str) == sorted(expected, key=str)


def test_page_builder_fuses_synthesis_into_one_arrow_stage(spark):
    """page_builder runs the documents→html synthesis INSIDE the
    consensus kernel's Arrow stage: output is row-identical to the
    two-stage (separate mapInPandas) path, and the fused plan contains
    exactly ONE MapInPandas node."""
    import pandas as pd

    from edspdf_spark.fixtures import html_page_batch

    docs = spark.createDataFrame(
        [(i, f"word{i} " * 30 + "plenty of ordinary body words here")
         for i in range(6)],
        "doc_id long, text string",
    )
    kw = dict(min_votes=2, min_words=3, max_link_density=0.4,
              context_sensitive=True)

    def synth(batches):
        for pdf in batches:
            yield html_page_batch(pdf)

    two_stage = extract_blocs_consensus(
        docs.mapInPandas(synth, "url string, html binary"), **kw
    )
    fused = extract_blocs_consensus(docs, page_builder=html_page_batch, **kw)

    key = lambda r: (r.url, r.page_num, r.bloc_ord, r.text, r.label, r.error)
    assert sorted(map(key, fused.collect())) == sorted(
        map(key, two_stage.collect())
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan
