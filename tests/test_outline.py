"""Heading-outline extraction (operators/extract_html.extract_outline):
hand-built pages with known hierarchy, skip-level parents, traps, and a
DuckDB replay of the regex parse."""

import duckdb
import pytest

from edspdf_spark.operators import extract_outline


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def test_outline_hierarchy_and_parents(spark):
    html = (
        "<html><body>"
        "<h1>Title</h1>"
        "<p>intro</p>"
        "<h2 class='x'>Section <span>A</span></h2>"
        "<h3>Sub A1</h3>"
        "<h2>Section B</h2>"
        "<h3>Sub B1</h3>"
        "<h6>Deep &amp; odd</h6>"
        "</body></html>"
    )
    got = (
        extract_outline(_pages(spark, [("u", html)]))
        .orderBy("seq")
        .collect()
    )
    rows = [(r.seq, r.level, r.heading, r.parent_seq) for r in got]
    assert rows == [
        (0, 1, "Title", None),
        (1, 2, "Section A", 0),
        (2, 3, "Sub A1", 1),
        (3, 2, "Section B", 0),
        (4, 3, "Sub B1", 3),
        (5, 6, "Deep & odd", 4),
    ]


def test_outline_skip_level_and_orphan(spark):
    # h3 directly under h1 (skip-level) and a document starting at h2
    a = "<h1>Root</h1><h3>Skip</h3><h2>Back</h2>"
    b = "<h2>Orphan lead</h2><h4>Child</h4>"
    got = extract_outline(_pages(spark, [("a", a), ("b", b)])).collect()
    by = {(r.url, r.seq): (r.level, r.parent_seq) for r in got}
    assert by[("a", 1)] == (3, 0)  # h3's parent is the h1
    assert by[("a", 2)] == (2, 0)  # h2's parent is the h1, not the h3
    assert by[("b", 0)] == (2, None)  # no smaller level before it
    assert by[("b", 1)] == (4, 0)


def test_outline_traps_ignored(spark):
    html = (
        "<script>var x = '<h2>fake</h2>';</script>"
        "<!-- <h3>commented</h3> -->"
        "<h2>Real</h2>"
        "<h3>mismatch closer</h4>"  # ANY </hN> closes (HTML5-style recovery)
        "<h5>never closed"  # no </hN> at all → not a heading
    )
    got = extract_outline(_pages(spark, [("u", html)])).orderBy("seq").collect()
    assert [(r.level, r.heading) for r in got] == [
        (2, "Real"),
        (3, "mismatch closer"),
    ]


def test_outline_empty_and_no_headings(spark):
    got = extract_outline(
        _pages(spark, [("u", "<p>no headings here</p>")])
    ).collect()
    assert got == []


def test_outline_matches_duckdb_replay(spark):
    pages = [
        (
            f"u{i}",
            f"<h1>Doc {i}</h1><h2>Part {i}.1</h2><h3>Leaf</h3>"
            f"<h2>Part {i}.2</h2>",
        )
        for i in range(20)
    ]
    got = sorted(
        (r.url, r.seq, r.level, r.heading, r.parent_seq)
        for r in extract_outline(_pages(spark, pages)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pages AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in pages)
        + ") t(url, html)",
        [x for row in pages for x in row],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            r"""
WITH m AS (
  SELECT url,
    regexp_extract_all(html, '(?is)<h([1-6])\b[^>]*>(.*?)</h[1-6]\s*>', 1) AS lv,
    regexp_extract_all(html, '(?is)<h([1-6])\b[^>]*>(.*?)</h[1-6]\s*>', 2) AS bd
  FROM pages
), e AS (
  SELECT url, g.i - 1 AS seq, CAST(lv[g.i] AS INT) AS level,
    trim(regexp_replace(regexp_replace(bd[g.i], '<[^>]+>', ' ', 'g'),
                        '\s+', ' ', 'g')) AS heading
  FROM m, LATERAL (SELECT unnest(generate_series(1, len(lv))) AS i) g
), p AS (
  SELECT url, seq, level, heading,
    COALESCE(MAX(CASE WHEN level = 1 THEN seq END) OVER prev, -1) AS m1,
    COALESCE(MAX(CASE WHEN level = 2 THEN seq END) OVER prev, -1) AS m2,
    COALESCE(MAX(CASE WHEN level = 3 THEN seq END) OVER prev, -1) AS m3,
    COALESCE(MAX(CASE WHEN level = 4 THEN seq END) OVER prev, -1) AS m4,
    COALESCE(MAX(CASE WHEN level = 5 THEN seq END) OVER prev, -1) AS m5
  FROM e
  WINDOW prev AS (PARTITION BY url ORDER BY seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT url, seq, level, heading,
  CASE WHEN level = 1 THEN NULL
       WHEN greatest(m1, m2, m3, m4, m5,
            CASE level WHEN 2 THEN m1
                       WHEN 3 THEN greatest(m1, m2)
                       WHEN 4 THEN greatest(m1, m2, m3)
                       WHEN 5 THEN greatest(m1, m2, m3, m4)
                       ELSE greatest(m1, m2, m3, m4, m5) END) IS NULL THEN NULL
       ELSE (CASE level WHEN 2 THEN m1
                        WHEN 3 THEN greatest(m1, m2)
                        WHEN 4 THEN greatest(m1, m2, m3)
                        WHEN 5 THEN greatest(m1, m2, m3, m4)
                        ELSE greatest(m1, m2, m3, m4, m5) END) END AS parent
FROM p
"""
        ).fetchall()
    )
    want = sorted(
        (u, s, l, h, None if (p is None or p < 0) else p)
        for (u, s, l, h, p) in want
    )
    assert got == want


# --- extract_sections -------------------------------------------------------

from edspdf_spark.operators.extract_html import extract_sections


def test_sections_bodies_and_crumbs(spark):
    html = (
        "lead-in text"
        "<h1>Top</h1><p>alpha beta</p>"
        "<h2>Mid</h2>gamma"
        "<h3>Leaf</h3><p>delta</p>"
        "<h2>Mid2</h2>"
    )
    got = (
        extract_sections(_pages(spark, [("u", html)]))
        .orderBy("seq")
        .collect()
    )
    rows = [(r.seq, r.level, r.heading, r.crumb, r.body) for r in got]
    assert rows == [
        (-1, 0, None, "", "lead-in text"),
        (0, 1, "Top", "", "alpha beta"),
        (1, 2, "Mid", "Top", "gamma"),
        (2, 3, "Leaf", "Top > Mid", "delta"),
        (3, 2, "Mid2", "Top", ""),
    ]


def test_sections_staircase_excludes_preceding_deeper_levels(spark):
    # an h2 BEFORE the h1 root must not appear in crumbs after the h1
    html = "<h2>A</h2><p>one</p><h1>Root</h1><h3>C</h3>two"
    got = (
        extract_sections(_pages(spark, [("u", html)]))
        .orderBy("seq")
        .collect()
    )
    rows = [(r.seq, r.level, r.heading, r.crumb, r.body) for r in got]
    assert rows == [
        (0, 2, "A", "", "one"),
        (1, 1, "Root", "", ""),
        (2, 3, "C", "Root", "two"),
    ]


def test_sections_nearer_mid_level_wins_crumb(spark):
    # h3 then h2 then h4: the crumb of the h4 is the h2 (nearest), and the
    # earlier h3 is excluded by the staircase
    html = "<h3>Old</h3><h2>New</h2><h4>Deep</h4>x"
    got = extract_sections(_pages(spark, [("u", html)])).collect()
    by = {r.seq: (r.crumb, r.body) for r in got}
    assert by[2] == ("New", "x")


def test_sections_empty_preamble_skipped(spark):
    html = "<h1>T</h1>body"
    got = extract_sections(_pages(spark, [("u", html)])).collect()
    assert sorted(r.seq for r in got) == [0]


def test_sections_no_headings_only_preamble(spark):
    got = extract_sections(
        _pages(spark, [("u", "<p>just text</p>")])
    ).collect()
    assert [(r.seq, r.level, r.heading, r.crumb, r.body) for r in got] == [
        (-1, 0, None, "", "just text")
    ]


# --- sections_to_chunks --------------------------------------------------------

from edspdf_spark.functions.text import sections_to_chunks


def test_sections_to_chunks_titles_and_windows(spark):
    html = (
        "lead words here"
        "<h1>Top</h1><p>" + " ".join(f"w{i}" for i in range(10)) + "</p>"
        "<h2>Empty Stub</h2>"
    )
    secs = extract_sections(_pages(spark, [("u", html)]))
    got = sorted(
        (r.seq, r.chunk_idx, r.chunk_n_tokens, r.chunk_text)
        for r in sections_to_chunks(secs, window=6, stride=6).collect()
    )
    # preamble: plain text, no title prefix
    assert got[0] == (-1, 0, 3, "lead words here")
    # h1 section: "Top — w0..." windowed at 6 tokens
    assert got[1][:3] == (0, 0, 6) and got[1][3].startswith("Top — w0")
    assert got[2][:3] == (0, 1, 6)
    # stub heading yields its title line (crumb > heading)
    assert got[3] == (1, 0, 4, "Top > Empty Stub")


def test_sections_to_chunks_urls_with_hash(spark):
    # a url containing '#' must round-trip through the composite id
    html = "<h1>T</h1>body text"
    secs = extract_sections(_pages(spark, [("https://a.com/p#frag", html)]))
    got = sections_to_chunks(secs).collect()
    assert [(r.url, r.seq) for r in got] == [("https://a.com/p#frag", 0)]


# --- sections_to_markdown -------------------------------------------------------

from edspdf_spark.operators.extract_html import sections_to_markdown


def test_sections_to_markdown_roundtrip(spark):
    html = (
        "intro line"
        "<h1>Guide</h1><p>alpha</p>"
        "<h2>Install</h2>beta gamma"
        "<h2>Use</h2>"
    )
    secs = extract_sections(_pages(spark, [("u", html)]))
    got = sections_to_markdown(secs).collect()
    assert len(got) == 1
    assert got[0].markdown == (
        "intro line\n\n"
        "# Guide\n\nalpha\n\n"
        "## Install\n\nbeta gamma\n\n"
        "## Use"
    )


def test_sections_to_markdown_partitioning_invariant(spark):
    pages = [(f"u{i}", f"<h1>T{i}</h1>body {i}<h3>S</h3>tail") for i in range(12)]
    secs = extract_sections(_pages(spark, pages))
    a = {r.url: r.markdown for r in sections_to_markdown(secs).collect()}
    b = {r.url: r.markdown
         for r in sections_to_markdown(secs.repartition(7)).collect()}
    assert a == b
    assert a["u3"] == "# T3\n\nbody 3\n\n### S\n\ntail"
