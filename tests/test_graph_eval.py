"""Link-graph PageRank (functions/graph.py) and extraction-quality P/R/F1
(functions/eval.py): exact-arithmetic determinism and DuckDB oracle parity."""

from __future__ import annotations

import duckdb
import pytest

from edspdf_spark.functions.eval import extraction_prf_oracle_sql, token_prf
from edspdf_spark.functions.graph import (
    SCALE,
    extract_links,
    pagerank,
    pagerank_oracle_sql,
)

EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # d is dangling-in only source; no in-links
    ("a", "a"),  # self-loop: must be dropped
    ("a", "b"),  # duplicate: must be dropped
]


def test_pagerank_matches_duckdb_unrolled(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: (r["rank_micro"], r["rank"])
        for r in pagerank(edges, iterations=4).collect()
    }

    con = duckdb.connect()
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iterations=4
    )
    want = {n: (int(m), r) for n, m, r in con.execute(sql).fetchall()}
    assert got == want
    # sanity on the recurrence itself: dangling-in 'd' holds exactly the
    # teleport base after round 1 (nothing links to it)
    assert got["d"][0] == (3 * SCALE) // 20
    # 'c' has the most in-links → top rank
    assert max(got, key=lambda k: got[k][0]) == "c"


def test_pagerank_deterministic_across_partitioning(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    a = sorted(pagerank(edges, iterations=3).collect())
    b = sorted(pagerank(edges.repartition(7), iterations=3).collect())
    assert a == b


def test_pagerank_empty(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, iterations=2).count() == 0


def test_extract_links_binary_and_string(spark):
    html = b'<a href="https://x.org/1">one</a> <a href="/rel">two</a>'
    pages_bin = spark.createDataFrame([("u", html)], "url string, html binary")
    got = [tuple(r) for r in extract_links(pages_bin).collect()]
    assert got == [("u", "https://x.org/1"), ("u", "/rel")]

    pages_str = spark.createDataFrame(
        [("u", html.decode())], "url string, html string"
    )
    assert [tuple(r) for r in extract_links(pages_str).collect()] == got


PRF_EXTRACTED = [("u1", "the cat sat sat"), ("u2", ""), ("u4", "noise words")]
PRF_GOLD = [("u1", "the cat sat on the mat"), ("u2", "missing doc"), ("u3", "")]


def test_token_prf_values(spark):
    ex = spark.createDataFrame(PRF_EXTRACTED, "url string, text string")
    gd = spark.createDataFrame(PRF_GOLD, "url string, text string")
    rows = {r["url"]: r for r in token_prf(ex, gd).collect()}

    # u1: extracted {the,cat,sat,sat} vs gold {the:2,cat,sat,on,mat}
    #     tp = min-counts = the 1 + cat 1 + sat 1 = 3
    assert (rows["u1"]["n_extracted"], rows["u1"]["n_gold"], rows["u1"]["tp"]) == (
        4,
        6,
        3,
    )
    assert rows["u1"]["precision"] == pytest.approx(3 / 4)
    assert rows["u1"]["recall"] == pytest.approx(3 / 6)
    # u2: empty extraction, non-empty gold → P=0, R=0, F1=0
    assert (rows["u2"]["precision"], rows["u2"]["recall"], rows["u2"]["f1"]) == (
        0.0,
        0.0,
        0.0,
    )
    # u3: empty gold + no extraction row → P=1 (vacuous), R=1
    assert (rows["u3"]["precision"], rows["u3"]["recall"]) == (1.0, 1.0)
    # u4 is not a gold doc → no row (scores are per gold document)
    assert "u4" not in rows
    assert set(rows) == {"u1", "u2", "u3"}


def test_token_prf_matches_duckdb(spark):
    ex = spark.createDataFrame(PRF_EXTRACTED, "url string, text string")
    gd = spark.createDataFrame(PRF_GOLD, "url string, text string")
    got = sorted(tuple(r) for r in token_prf(ex, gd).collect())

    con = duckdb.connect()
    ev = ", ".join(f"('{u}', '{t}')" for u, t in PRF_EXTRACTED)
    gv = ", ".join(f"('{u}', '{t}')" for u, t in PRF_GOLD)
    sql = extraction_prf_oracle_sql(
        f"SELECT * FROM (VALUES {ev}) AS e(url, text)",
        f"SELECT * FROM (VALUES {gv}) AS g(url, text)",
    )
    want = sorted(
        (u, int(ne), int(ng), int(tp), p, r, f)
        for u, ne, ng, tp, p, r, f in con.execute(sql).fetchall()
    )
    assert got == want


def test_extract_anchors_and_rollup(spark):
    from pyspark.sql import functions as F

    from edspdf_spark.functions.graph import anchor_text_rollup, extract_anchors

    pages = spark.createDataFrame(
        [
            ("a", '<a href="t">Nice  Page</a> <a class="x" href="t">nice2</a>'),
            ("b", '<a href="t">Nice Page</a> <a href="u"></a>'),
            ("c", '<a href="u">  spaced   out </a><a href="t">Apple</a>'),
        ],
        "url string, html string",
    )
    anchors = sorted(
        (r.src, r.dst, r.anchor) for r in extract_anchors(pages).collect()
    )
    assert ("a", "t", "Nice Page") in anchors  # whitespace normalized
    assert ("b", "u", "") in anchors  # empty anchors kept in the edge list
    assert ("c", "u", "spaced out") in anchors

    roll = {
        r.dst: (r.n_inlinks, r.n_srcs, r.top_anchor, r.top_anchor_count)
        for r in anchor_text_rollup(extract_anchors(pages)).collect()
    }
    # t: 4 inbound links from 3 distinct sources; "Nice Page" wins (2 hits);
    # tie-break check: Apple(1) vs nice2(1) both lose to the count-2 winner
    assert roll["t"] == (4, 3, "Nice Page", 2)
    # u: 2 inbound, one empty anchor → top is the only non-empty text
    assert roll["u"] == (2, 2, "spaced out", 1)

    # count tie → lexicographically smallest anchor wins
    tie = spark.createDataFrame(
        [("x", '<a href="t">beta</a>'), ("y", '<a href="t">alpha</a>')],
        "url string, html string",
    )
    r = anchor_text_rollup(extract_anchors(tie)).collect()[0]
    assert (r.top_anchor, r.top_anchor_count) == ("alpha", 1)


def test_hits_star_graph(spark):
    from edspdf_spark.functions.graph import SCALE, hits

    # star: spokes all link to the center → center is THE authority,
    # spokes are equal hubs, center has hub 0 (no out-links)
    edges = spark.createDataFrame(
        [(f"s{i}", "c") for i in range(5)], "src string, dst string"
    )
    got = {r.node: (r.auth_micro, r.hub_micro) for r in hits(edges, 2).collect()}
    assert got["c"] == (SCALE, 0)
    for i in range(5):
        assert got[f"s{i}"] == (0, SCALE)


def test_hits_matches_duckdb_unrolled(spark):
    import duckdb

    from edspdf_spark.functions.graph import hits, hits_oracle_sql

    rows = [(i, (i * 2 + 1) % 17) for i in range(17)] + [
        (i, (i * 5 + 3) % 17) for i in range(17)
    ]
    edges = spark.createDataFrame(rows, "src int, dst int")
    got = sorted(
        (r.node, r.auth_micro, r.hub_micro) for r in hits(edges, 3).collect()
    )
    sql = hits_oracle_sql(
        "SELECT (i * 1) % 17 AS src, (i * 2 + 1) % 17 AS dst FROM range(17) t(i) "
        "UNION ALL SELECT i % 17, (i * 5 + 3) % 17 FROM range(17) t(i)",
        iterations=3,
    )
    want = sorted((int(n), int(a), int(h)) for n, a, h in duckdb.sql(sql).fetchall())
    assert got == want


def test_hits_deterministic_across_partitioning(spark):
    from edspdf_spark.functions.graph import hits

    rows = [(i, (i * 3 + 1) % 23) for i in range(23)]
    a = sorted(
        tuple(r)
        for r in hits(spark.createDataFrame(rows, "src int, dst int").repartition(1), 2).collect()
    )
    b = sorted(
        tuple(r)
        for r in hits(spark.createDataFrame(rows, "src int, dst int").repartition(7), 2).collect()
    )
    assert a == b


# --- extract_text_urls ---------------------------------------------------------

from edspdf_spark.functions.graph import extract_text_urls


def test_extract_text_urls_basic_and_trim(spark):
    df = spark.createDataFrame(
        [
            (0, "see https://a.com/x. and HTTP://B.com/y?q=1, ok"),
            (1, "(https://c.com/p) [https://d.com/q] none-here"),
            (2, "no urls at all"),
        ],
        "doc_id long, text string",
    )
    got = sorted((r.doc_id, r.url) for r in extract_text_urls(df).collect())
    assert got == [
        (0, "HTTP://B.com/y?q=1"),
        (0, "https://a.com/x"),
        (1, "https://c.com/p"),
        (1, "https://d.com/q"),
    ]


def test_extract_text_urls_duckdb_replay(spark):
    import duckdb

    rows = [(i, f"intro https://h{i % 3}.com/p/{i}. tail http://x.org/{i}?a=b;")
            for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r.doc_id, r.url) for r in extract_text_urls(df).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in rows) + ") v(doc_id, text)",
        [x for row in rows for x in row],
    )
    want = sorted(tuple(r) for r in con.execute(r"""
SELECT doc_id, regexp_replace(u, '[.,;:!?]+$', '') AS url
FROM (
  SELECT doc_id,
    unnest(regexp_extract_all(text, '(?i)\bhttps?://[^\s<>"'')\]}]+', 0)) AS u
  FROM t
)
""").fetchall())
    assert got == want


def test_zero_iterations_graceful(spark):
    """iterations=0 returns the initial state for BOTH walkers (hits used
    to crash joining a None auth frame)."""
    from edspdf_spark.functions.graph import SCALE, hits, pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    h = {r.node: (r.auth_micro, r.hub_micro) for r in hits(e, iterations=0).collect()}
    assert set(h) == {"a", "b", "c"}
    assert all(a == 0 and hm == SCALE for a, hm in h.values())
    pr = pagerank(e, iterations=0).collect()
    assert len(pr) == 3 and all(r.rank_micro == SCALE // 3 for r in pr)
