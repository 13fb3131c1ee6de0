"""Boilerpipe NumWordsRulesClassifier (Kohlschütter et al., WSDM 2010
"Boilerplate detection using shallow text features" — published decision
rules, reimplemented as pure Spark window expressions).

The Spark face at corpus scale is covered by the html_boilerplate oracle
query's ``algo='boilerpipe'`` leg; these tests pin every decision branch
of the rule tree, including the two look-ahead rescues the deterministic
oracle template cannot exercise (they would depend on the variable
per-document text).
"""

from __future__ import annotations

import pytest

from edspdf_spark.operators.extract_html import (
    classify_blocks_boilerpipe,
    extract_blocs_boilerpipe,
    html_block_features,
)


def _features_df(spark, rows):
    # rows: (pos, n_words, link_density)
    data = [("u", p, f"t{p}", w, ld, False) for p, w, ld in rows]
    return spark.createDataFrame(
        data,
        "url string, pos int, text string, n_words int, "
        "link_density double, error boolean",
    )


def _labels(spark, rows):
    out = (
        classify_blocks_boilerpipe(_features_df(spark, rows))
        .orderBy("pos")
        .select("label")
        .collect()
    )
    return [r.label for r in out]


def test_link_density_rule_dominates(spark):
    # ld > 1/3 is boilerplate no matter how wordy the block is
    assert _labels(spark, [(0, 500, 0.5), (1, 500, 0.34)]) == [
        "boilerplate",
        "boilerplate",
    ]


def test_low_prev_branch_curr_words(spark):
    # prev ld <= 0.555556 (edge default 0.0): content iff words > 16
    assert _labels(spark, [(0, 17, 0.0)]) == ["body"]
    assert _labels(spark, [(0, 16, 0.0)]) == ["boilerplate"]


def test_low_prev_branch_next_words_rescue(spark):
    # 1-word block rescued by a >15-word successor under a low-ld prev
    assert _labels(spark, [(0, 1, 0.0), (1, 16, 0.0)]) == ["body", "boilerplate"]
    # successor at exactly 15 words does not rescue (and itself has
    # prev_words 1 <= 4, own 15 <= 16, next edge 0: boilerplate too)
    assert _labels(spark, [(0, 1, 0.0), (1, 15, 0.0)]) == [
        "boilerplate",
        "boilerplate",
    ]


def test_low_prev_branch_prev_words_rescue(spark):
    # short block after a 5-word low-ld block is content
    assert _labels(spark, [(0, 5, 0.0), (1, 1, 0.0)]) == ["boilerplate", "body"]
    assert _labels(spark, [(0, 4, 0.0), (1, 1, 0.0)]) == [
        "boilerplate",
        "boilerplate",
    ]


def test_dense_prev_branch(spark):
    # prev ld > 0.555556: stricter thresholds words > 40 / next > 17
    assert _labels(spark, [(0, 2, 0.6), (1, 41, 0.0)]) == ["boilerplate", "body"]
    assert _labels(spark, [(0, 2, 0.6), (1, 40, 0.0)]) == [
        "boilerplate",
        "boilerplate",
    ]
    # next-words rescue at > 17 (the 18-word follower is itself content
    # via prev_words 1 > 4? no — prev is the 1-word block: 1 <= 4, own 18
    # > 16 under its low-ld prev → body)
    assert _labels(spark, [(0, 2, 0.6), (1, 1, 0.0), (2, 18, 0.0)]) == [
        "boilerplate",
        "body",
        "body",
    ]


TEMPLATE = (
    "<html><body>"
    "<nav><a href='/'>Home</a> <a href='/a'>About</a> "
    "<a href='/c'>Contact</a></nav>"
    "<p>{lead}</p>"
    "<p>{doc}</p>"
    "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a></footer>"
    "<p>All rights reserved notice</p>"
    "</body></html>"
)

LEAD42 = (
    "The quick brown fox jumps over the lazy dog while the patient editor "
    "counts every single word in this deliberately long lead paragraph so "
    "that the shallow text feature classifier marks it as proper long form "
    "article content without any doubt whatsoever."
)


def test_extract_blocs_boilerpipe_end_to_end(spark):
    assert len(LEAD42.split()) == 42
    html = TEMPLATE.format(lead=LEAD42, doc="Tiny doc.").encode()
    pages = spark.createDataFrame([("u", html)], "url string, html binary")
    rows = extract_blocs_boilerpipe(pages).orderBy("bloc_ord").collect()
    assert [r.label for r in rows] == [
        "boilerplate",  # nav: ld ~0.89 > 1/3
        "body",  # 42-word lead after dense nav: words > 40
        "body",  # doc text: prev_words 42 > 4 under low-ld prev
        "boilerplate",  # footer links
        "boilerplate",  # short tail after dense footer, nothing rescues
    ]
    assert [r.text for r in rows] == [
        "Home About Contact",
        LEAD42,
        "Tiny doc.",
        "Privacy Terms",
        "All rights reserved notice",
    ]
    # pseudo-geometry: document order drives y within the page
    assert all(not r.error for r in rows)
    assert [r.page_num for r in rows] == [0] * 5
    assert [r.bloc_ord for r in rows] == list(range(5))
    ys = [r.y0 for r in rows]
    assert ys == sorted(ys) and len(set(ys)) == 5


def test_boilerpipe_error_sentinel(spark):
    pages = spark.createDataFrame(
        [("bad", b"no markup at all"), ("null", None)],
        "url string, html binary",
    )
    rows = extract_blocs_boilerpipe(pages).collect()
    assert {r.url: r.error for r in rows} == {"bad": True, "null": True}
    assert all(r.label is None and r.text is None for r in rows)


def test_html_block_features_counts(spark):
    html = TEMPLATE.format(lead=LEAD42, doc="Tiny doc.").encode()
    pages = spark.createDataFrame([("u", html)], "url string, html binary")
    feats = html_block_features(pages).orderBy("pos").collect()
    assert [f.n_words for f in feats] == [3, 42, 2, 2, 4]
    assert feats[0].link_density == pytest.approx(16 / 18)
    assert feats[1].link_density == 0.0
    assert feats[3].link_density == pytest.approx(12 / 13)
