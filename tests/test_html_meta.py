"""HTML head-metadata extraction (`operators/extract_html.extract_html_meta`):
pure-expression regex fields over decoded pages, attribute order handled in
both directions, plus a DuckDB differential validating the shared regex
dialect (the driver-oracle contract)."""

from __future__ import annotations

import duckdb
import pytest

from edspdf_spark.operators.extract_html import extract_html_meta

PAGES = [
    (
        "u0",
        "<html lang=\"en-US\"><head><title>Doc zero</title>"
        "<meta name=\"description\" content=\"summary zero\">"
        "<meta content=\"OG zero\" property=\"og:title\">"
        "<meta property=\"og:description\" content=\"og summary zero\">"
        "<meta property=\"article:published_time\" content=\"2026-01-02\">"
        "<link href=\"https://ex.com/0\" rel=\"canonical\">"
        "<meta name=\"robots\" content=\"noindex,nofollow\">"
        "</head><body><p>x</p></body></html>",
    ),
    (
        "u1",
        "<html lang='fr'><head><title>Doc un</title>"
        "<meta content=\"résumé un\" name=\"description\">"
        "<link rel=\"canonical\" href=\"https://ex.com/1\">"
        "<meta property=\"og:title\" content=\"OG un\">"
        "<meta name=\"robots\" content=\"index, follow\">"
        "</head><body></body></html>",
    ),
    ("u2", "<html><body>no head at all</body></html>"),
    ("u3", "<HTML LANG=\"de\"><HEAD><TITLE>CAPS</TITLE></HEAD></HTML>"),
]


@pytest.fixture(scope="module")
def meta_rows(spark):
    df = spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in PAGES], "url string, html binary"
    )
    return {r["url"]: r.asDict() for r in extract_html_meta(df).collect()}


def test_fields_both_attribute_orders(meta_rows):
    r0 = meta_rows["u0"]
    assert r0["html_title"] == "Doc zero"
    assert r0["meta_description"] == "summary zero"
    assert r0["og_title"] == "OG zero"            # content-first order
    assert r0["og_description"] == "og summary zero"
    assert r0["published_time"] == "2026-01-02"
    assert r0["canonical_url"] == "https://ex.com/0"   # href-first order
    assert r0["html_lang"] == "en-US"
    assert r0["robots_noindex"] and r0["robots_nofollow"]

    r1 = meta_rows["u1"]
    assert r1["meta_description"] == "résumé un"
    assert r1["canonical_url"] == "https://ex.com/1"
    assert r1["og_title"] == "OG un"
    assert r1["html_lang"] == "fr"
    assert not r1["robots_noindex"] and not r1["robots_nofollow"]


def test_absent_fields_are_empty_not_null(meta_rows):
    r2 = meta_rows["u2"]
    for f in (
        "html_title",
        "meta_description",
        "canonical_url",
        "og_title",
        "og_description",
        "published_time",
        "html_lang",
    ):
        assert r2[f] == "", f
    assert r2["robots_noindex"] is False


def test_case_insensitive_tags(meta_rows):
    assert meta_rows["u3"]["html_title"] == "CAPS"
    assert meta_rows["u3"]["html_lang"] == "de"


def test_duckdb_differential(meta_rows):
    """DuckDB (RE2) replays the same patterns on the same pages."""
    from edspdf_spark.operators.extract_html import (
        _HTML_LANG_RE,
        _LINK_CANONICAL_RES,
        _TITLE_RE,
        _meta_pair_res,
    )

    con = duckdb.connect()

    def first_nonempty(s, pats):
        for p in pats:
            got = con.execute(
                "SELECT regexp_extract($s, $p, 1)", {"s": s, "p": p}
            ).fetchone()[0]
            if got:
                return got
        return ""

    for url, html in PAGES:
        got = meta_rows[url]
        assert first_nonempty(html, [_TITLE_RE]) == got["html_title"]
        assert (
            first_nonempty(html, _meta_pair_res("name", "description"))
            == got["meta_description"]
        )
        assert first_nonempty(html, _LINK_CANONICAL_RES) == got["canonical_url"]
        assert (
            first_nonempty(html, _meta_pair_res("property", "og:title"))
            == got["og_title"]
        )
        assert first_nonempty(html, [_HTML_LANG_RE]) == got["html_lang"]
        robots = first_nonempty(html, _meta_pair_res("name", "robots"))
        assert ("noindex" in robots.lower()) == got["robots_noindex"]
        assert ("nofollow" in robots.lower()) == got["robots_nofollow"]


def test_extract_image_pairs(spark):
    """LAION-style pair harvest: both attribute orders and quote styles,
    alt-less / src-less tags filtered, img_idx is pre-filter position,
    min_alt_len gate, multiple imgs per page."""
    from edspdf_spark.operators.extract_html import extract_image_pairs

    pages = spark.createDataFrame(
        [
            (
                "p1",
                (
                    "<html><p>x</p>"
                    '<img src="/a.jpg" alt="a cat photo">'
                    "<img src='/b.png' alt='dog'>"
                    '<img alt="ordered first" src="/c.gif">'
                    '<img src="/noalt.jpg">'
                    '<img alt="nosrc">'
                    '<img src="/empty.jpg" alt="">'
                    "</html>"
                ).encode(),
            ),
            ("p2", b"<html><p>no images</p></html>"),
        ],
        "url string, html binary",
    )
    got = sorted(
        (r.url, r.img_idx, r.img_src, r.alt_text)
        for r in extract_image_pairs(pages).collect()
    )
    assert got == [
        ("p1", 0, "/a.jpg", "a cat photo"),
        ("p1", 1, "/b.png", "dog"),
        ("p1", 2, "/c.gif", "ordered first"),
    ]
    # min_alt_len raises the bar
    strict = {
        r.img_idx
        for r in extract_image_pairs(pages, min_alt_len=4).collect()
    }
    assert strict == {0, 2}


def test_extract_image_pairs_uppercase_and_lazyload(spark):
    """Uppercase markup matches ((?i) like every other extractor) and the
    attribute-boundary guard keeps `src=` from matching inside
    `data-src=` lazy-load markup."""
    from edspdf_spark.operators.extract_html import extract_image_pairs

    pages = spark.createDataFrame(
        [
            ("u1", '<IMG SRC="dog.png" ALT="a dog">'.encode()),
            (
                "u2",
                '<img data-src="placeholder.gif" src="real.jpg" alt="x y">'.encode(),
            ),
        ],
        "url string, html binary",
    )
    got = {
        r.url: (r.img_src, r.alt_text)
        for r in extract_image_pairs(pages).collect()
    }
    assert got["u1"] == ("dog.png", "a dog")
    assert got["u2"] == ("real.jpg", "x y")


def test_extract_html_meta_ignores_commented_and_scripted(spark):
    """A commented-out meta draft or meta markup inside <script> must not
    fabricate fields — same rule as functions/discover.py."""
    from edspdf_spark.operators.extract_html import extract_html_meta

    html = (
        "<html><head><title>Live</title>"
        '<!-- <meta name="description" content="old draft"> -->'
        "<script>var x = '<meta property=\"article:published_time\""
        " content=\"2001-01-01\">';</script>"
        '<meta name="description" content="real one">'
        "</head></html>"
    ).encode()
    r = extract_html_meta(
        spark.createDataFrame([("u", html)], "url string, html binary")
    ).collect()[0]
    assert r.html_title == "Live"
    assert r.meta_description == "real one"
    assert r.published_time == ""
