"""Host-level template dedup (`functions/dedup.host_template_lines` /
`strip_host_boilerplate`): the per-site "line on most of a host's pages ⇒
chrome" rule, with an exact-integer fraction test and a DuckDB replay of
the whole relational plan."""

from __future__ import annotations

import duckdb
import pytest

from edspdf_spark.functions.dedup import (
    host_template_lines,
    strip_host_boilerplate,
)

# host a.com: 4 pages — COOKIE on all 4 (4/4), PROMO on exactly 2 (2/4 —
# the >= 0.5 boundary), unique body per page; page a3 repeats COOKIE
# twice WITHIN the page (counts once for the fraction, both stripped);
# page a4 is template-only and must survive empty.
# host b.com: 2 pages (< min_pages) sharing a line — never stripped.
PAGES = [
    ("https://a.com/1", "COOKIE\nbody one\nPROMO"),
    ("https://a.com/2", "COOKIE\nbody two"),
    ("https://a.com/3", "COOKIE\nbody three\nCOOKIE\nPROMO\n\nafter blank"),
    ("https://A.COM:443/4", "COOKIE"),  # case/port-shifted host, same site
    ("https://b.com/1", "SHARED\nuniq b1"),
    ("https://b.com/2", "SHARED\nuniq b2"),
]


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(PAGES, "url string, text string")


def test_template_table(pages_df):
    rows = {
        (r["host"], r["line"]): (r["n_pages"], r["n_host_pages"])
        for r in host_template_lines(pages_df, min_pages=4).collect()
    }
    assert rows == {
        ("a.com", "COOKIE"): (4, 4),
        ("a.com", "PROMO"): (2, 4),  # 2*1000 >= 500*4 — boundary included
    }


def test_strip(pages_df):
    got = {
        r["url"]: r["text"]
        for r in strip_host_boilerplate(pages_df, min_pages=4).collect()
    }
    assert got["https://a.com/1"] == "body one"
    assert got["https://a.com/2"] == "body two"
    # both in-page COOKIE copies removed, blank line kept (exempt)
    assert got["https://a.com/3"] == "body three\n\nafter blank"
    assert got["https://A.COM:443/4"] == ""  # template-only page survives
    # small host untouched
    assert got["https://b.com/1"] == "SHARED\nuniq b1"
    assert got["https://b.com/2"] == "SHARED\nuniq b2"


def test_fraction_threshold(pages_df):
    # raising the bar past 1/2 drops PROMO but keeps COOKIE
    rows = {
        r["line"]
        for r in host_template_lines(
            pages_df, min_pages=4, min_fraction=0.75
        ).collect()
    }
    assert rows == {"COOKIE"}
    got = {
        r["url"]: r["text"]
        for r in strip_host_boilerplate(
            pages_df, min_pages=4, min_fraction=0.75
        ).collect()
    }
    assert got["https://a.com/1"] == "body one\nPROMO"


def test_duckdb_differential(pages_df):
    """DuckDB replays the relational plan (explode → per-page distinct →
    integer cross-multiplied fraction → anti-join → positional rebuild)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE pages(url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", PAGES)
    oracle = con.execute(
        r"""
        WITH lines AS (
          SELECT url,
                 regexp_replace(regexp_replace(lower(
                   regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)
                 ), '^[^@]*@', ''), ':\d+$', '') AS host,
                 generate_subscripts(str_split(text, chr(10)), 1) - 1 AS pos,
                 unnest(str_split(text, chr(10))) AS line
          FROM pages
        ),
        per_line AS (
          SELECT host, line, COUNT(DISTINCT url) AS n_pages
          FROM lines WHERE len(line) >= 1 GROUP BY host, line
        ),
        per_host AS (
          SELECT host, COUNT(DISTINCT url) AS n_host_pages
          FROM lines GROUP BY host
        ),
        tmpl AS (
          SELECT host, line FROM per_line JOIN per_host USING (host)
          WHERE n_host_pages >= 4 AND n_pages * 1000 >= 500 * n_host_pages
        ),
        rebuilt AS (
          SELECT l.url,
                 string_agg(l.line, chr(10) ORDER BY l.pos) AS text
          FROM lines l
          LEFT JOIN tmpl t ON t.host = l.host AND t.line = l.line
                             AND len(l.line) >= 1
          WHERE t.line IS NULL
          GROUP BY l.url
        )
        -- a page whose every line was template must survive empty
        SELECT p.url, COALESCE(r.text, '') AS text
        FROM pages p LEFT JOIN rebuilt r USING (url)
        """
    ).fetchall()
    got = {
        r["url"]: r["text"]
        for r in strip_host_boilerplate(pages_df, min_pages=4).collect()
    }
    assert dict(oracle) == got


def test_strip_recrawled_url_not_merged(spark, pages_df):
    """A url fetched twice (recrawl) is stripped independently per row —
    grouping by url used to interleave and duplicate both fetches' lines
    into every output row."""
    dup = pages_df.unionByName(
        spark.createDataFrame(
            [("https://a.com/1", "COOKIE\nbody one\nPROMO")],
            "url string, text string",
        )
    )
    out = [
        r.text
        for r in strip_host_boilerplate(dup, min_fraction=0.5).collect()
        if r.url == "https://a.com/1"
    ]
    assert out == ["body one", "body one"]
    # row-count contract: one output row per input row
    assert strip_host_boilerplate(dup).count() == dup.count()
