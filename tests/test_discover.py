"""Crawl-discovery family (`functions/discover.py`): sitemap trees, feed
autodiscovery, RSS/Atom entries, JSON-LD blocks — pure-expression parses
plus a DuckDB differential on the shared regex/JSON-path dialect."""

from __future__ import annotations

import duckdb
import pytest

from edspdf_spark.functions.discover import (
    discover_feeds,
    extract_jsonld,
    parse_feed,
    parse_sitemap,
)

SITEMAPS = [
    (
        "https://ex.com/sitemap.xml",
        """<?xml version="1.0" encoding="UTF-8"?>
        <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          <url><loc>https://ex.com/a</loc><lastmod>2026-01-01</lastmod>
               <changefreq>daily</changefreq><priority>0.8</priority></url>
          <!-- commented out: <url><loc>https://ex.com/ghost</loc></url> -->
          <url><loc><![CDATA[https://ex.com/b?x=1&amp;y=2]]></loc></url>
          <url><lastmod>2026-01-02</lastmod></url>
        </urlset>""",
    ),
    (
        "https://ex.com/sitemap_index.xml",
        """<sitemapindex>
          <sitemap><loc>https://ex.com/s1.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
          <sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
        </sitemapindex>""",
    ),
]


@pytest.fixture(scope="module")
def sitemap_rows(spark):
    df = spark.createDataFrame(SITEMAPS, "sitemap_url string, xml string")
    return parse_sitemap(df).collect()


def test_sitemap_urlset(sitemap_rows):
    leaf = sorted(
        (r for r in sitemap_rows if r["kind"] == "url"),
        key=lambda r: r["entry_idx"],
    )
    # the loc-less third <url> is dropped, the commented-out one never parsed
    assert [r["loc"] for r in leaf] == [
        "https://ex.com/a",
        "https://ex.com/b?x=1&amp;y=2",  # entities kept raw, CDATA stripped
    ]
    assert leaf[0]["lastmod"] == "2026-01-01"
    assert leaf[0]["changefreq"] == "daily"
    assert leaf[0]["priority"] == "0.8"
    assert leaf[1]["lastmod"] == ""  # absent → '' not NULL


def test_sitemap_index(sitemap_rows):
    idx = sorted(
        (r for r in sitemap_rows if r["kind"] == "sitemap"),
        key=lambda r: r["entry_idx"],
    )
    assert [r["loc"] for r in idx] == [
        "https://ex.com/s1.xml",
        "https://ex.com/s2.xml",
    ]
    assert idx[0]["sitemap_url"] == "https://ex.com/sitemap_index.xml"
    assert idx[0]["lastmod"] == "2026-02-01" and idx[1]["lastmod"] == ""


FEED_PAGES = [
    (
        "https://ex.com/",
        "<html><head>"
        '<link rel="alternate" type="application/rss+xml" href="https://ex.com/rss">'
        "<LINK TYPE='application/atom+xml' HREF='https://ex.com/atom' REL='alternate'>"
        '<link rel="stylesheet" type="text/css" href="/s.css">'
        '<link rel="alternate" hreflang="fr" href="https://ex.com/fr">'
        "</head></html>",
    ),
    ("https://none.com/", "<html><head><title>t</title></head></html>"),
]


def test_discover_feeds(spark):
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in FEED_PAGES], "url string, html binary"
    )
    got = {(r["feed_url"], r["feed_kind"]) for r in discover_feeds(df).collect()}
    assert got == {
        ("https://ex.com/rss", "rss"),
        ("https://ex.com/atom", "atom"),
    }


FEEDS = [
    (
        "https://ex.com/rss",
        """<rss version="2.0"><channel><title>chan</title>
        <item><title><![CDATA[First & last]]></title>
              <link>https://ex.com/p1</link>
              <pubDate>Mon, 02 Feb 2026 10:00:00 GMT</pubDate>
              <guid isPermaLink="true">g1</guid></item>
        <item><title>Second</title></item>
        </channel></rss>""",
    ),
    (
        "https://ex.com/atom",
        """<feed xmlns="http://www.w3.org/2005/Atom"><title>feed</title>
        <entry><title>A1</title><link rel="alternate" href="https://ex.com/a1"/>
               <updated>2026-03-01T00:00:00Z</updated><id>tag:a1</id></entry>
        <entry><title>A2</title><link href='https://ex.com/a2'/>
               <published>2026-03-02T00:00:00Z</published>
               <updated>2026-03-03T00:00:00Z</updated><id>tag:a2</id></entry>
        </feed>""",
    ),
]


def test_parse_feed(spark):
    df = spark.createDataFrame(FEEDS, "feed_url string, xml string")
    rows = {
        (r["feed_kind"], r["entry_idx"]): r for r in parse_feed(df).collect()
    }
    r0 = rows[("rss", 0)]
    assert r0["title"] == "First & last"  # CDATA stripped, entity kept
    assert r0["link"] == "https://ex.com/p1"
    assert r0["published"].startswith("Mon, 02 Feb")
    assert r0["entry_id"] == "g1"
    assert rows[("rss", 1)]["link"] == ""  # absent → ''
    a0, a1 = rows[("atom", 0)], rows[("atom", 1)]
    assert a0["link"] == "https://ex.com/a1"  # href attribute, not text
    assert a0["published"] == "2026-03-01T00:00:00Z"  # updated fallback
    assert a1["published"] == "2026-03-02T00:00:00Z"  # published wins
    assert a1["entry_id"] == "tag:a2"
    # the channel-level <title> must NOT leak in as an entry
    assert len(rows) == 4


JSONLD_PAGES = [
    (
        "u0",
        '<html><head><script type="application/ld+json">'
        '{"@context":"https://schema.org","@type":"NewsArticle",'
        '"headline":"Big & small","datePublished":"2026-01-05",'
        '"author":{"@type":"Person","name":"Ada"}}'
        "</script></head></html>",
    ),
    (
        "u1",
        "<html><body><script type='application/ld+json'>"
        '[{"@type":"Article","headline":"Listed","author":'
        '[{"name":"Bob"},{"name":"Eve"}]}]'
        "</script><script type=\"application/ld+json\">not json</script></body></html>",
    ),
    ("u2", "<html><script>var x=1;</script></html>"),
]


@pytest.fixture(scope="module")
def jsonld_rows(spark):
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in JSONLD_PAGES], "url string, html binary"
    )
    return extract_jsonld(df).collect()


def test_jsonld_object_form(jsonld_rows):
    r = {(x["url"], x["block_idx"]): x for x in jsonld_rows}
    r0 = r[("u0", 0)]
    assert r0["ld_type"] == "NewsArticle"
    assert r0["headline"] == "Big & small"
    assert r0["date_published"] == "2026-01-05"
    assert r0["author_name"] == "Ada"


def test_jsonld_array_form_and_malformed(jsonld_rows):
    r = {(x["url"], x["block_idx"]): x for x in jsonld_rows}
    r1 = r[("u1", 0)]
    assert r1["ld_type"] == "Article" and r1["headline"] == "Listed"
    assert r1["author_name"] == "Bob"  # author list → first author
    bad = r[("u1", 1)]
    assert bad["ld_type"] is None and bad["jsonld"] == "not json"
    assert ("u2", 0) not in r  # plain <script> is not JSON-LD


def test_duckdb_differential_sitemap(sitemap_rows):
    """DuckDB (RE2) replays the sitemap fragment patterns verbatim."""
    con = duckdb.connect()
    for src, xml in SITEMAPS:
        stripped = con.execute(
            r"SELECT regexp_replace($x, '(?s)<!--.*?-->', ' ', 'g')", {"x": xml}
        ).fetchone()[0]
        for kind, pat in (
            ("url", r"(?is)<url\s*>(.*?)</url\s*>"),
            ("sitemap", r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"),
        ):
            frags = con.execute(
                "SELECT regexp_extract_all($x, $p, 1)",
                {"x": stripped, "p": pat},
            ).fetchone()[0]
            locs = [
                con.execute(
                    r"""SELECT trim(regexp_replace(trim(
                            regexp_extract($f, '(?is)<loc(?:\s[^>]*)?>(.*?)</loc\s*>', 1)
                        ), '(?s)^<!\[CDATA\[(.*)\]\]>$', '\1'))""",
                    {"f": f},
                ).fetchone()[0]
                for f in frags
            ]
            locs = [l for l in locs if l]
            got = [
                r["loc"]
                for r in sorted(
                    (
                        r
                        for r in sitemap_rows
                        if r["kind"] == kind and r["sitemap_url"] == src
                    ),
                    key=lambda r: r["entry_idx"],
                )
            ]
            assert locs == got, (src, kind)


def test_duckdb_differential_jsonld(jsonld_rows):
    """DuckDB's JSON extractor agrees on the schema.org fields."""
    con = duckdb.connect()
    r = {(x["url"], x["block_idx"]): x for x in jsonld_rows}
    for (url, idx), row in r.items():
        j = row["jsonld"]

        def dk(path):
            for pref in ("$", "$[0]"):
                got = con.execute(
                    "SELECT json_extract_string(TRY_CAST($j AS JSON), $p)",
                    {"j": j, "p": pref + path},
                ).fetchone()[0]
                if got is not None:
                    return got
            return None

        assert dk('."@type"') == row["ld_type"], (url, idx)
        assert dk(".headline") == row["headline"]
        assert dk(".datePublished") == row["date_published"]
        author = dk(".author.name") or dk(".author[0].name")
        assert author == row["author_name"]


# --- with_pub_date -----------------------------------------------------------

from edspdf_spark.functions.discover import with_pub_date


def _pd_pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def test_pub_date_precedence_and_sources(spark):
    rows = [
        # meta wins over a conflicting <time>
        ("https://a.com/x", '<meta property="article:published_time" '
         'content="2023-04-05T08:00:00Z"><time datetime="2020-01-01">old</time>'),
        # attribute order flipped
        ("https://b.com/x", '<meta content="2022-11-30" '
         'property="article:published_time">'),
        # JSON-LD
        ("https://c.com/x", '<script type="application/ld+json">'
         '{"@type":"Article","datePublished":"2021-07-09T12:00:00+02:00"}'
         "</script>"),
        # <time>
        ("https://d.com/x", '<p><time datetime="2019-02-28T23:59:00">x</time></p>'),
        # URL path only
        ("https://e.com/blog/2018/12/01/post", "<p>no markup</p>"),
        # nothing
        ("https://f.com/x", "<p>nothing</p>"),
    ]
    got = {
        r.url: (str(r.pub_date) if r.pub_date else None, r.pub_date_source)
        for r in with_pub_date(_pd_pages(spark, rows)).collect()
    }
    assert got["https://a.com/x"] == ("2023-04-05", "meta")
    assert got["https://b.com/x"] == ("2022-11-30", "meta")
    assert got["https://c.com/x"] == ("2021-07-09", "jsonld")
    assert got["https://d.com/x"] == ("2019-02-28", "time")
    assert got["https://e.com/blog/2018/12/01/post"] == ("2018-12-01", "url")
    assert got["https://f.com/x"] == (None, None)


def test_pub_date_malformed_falls_through(spark):
    rows = [
        # garbage meta → falls to the valid time tag
        ("https://a.com/x", '<meta property="article:published_time" '
         'content="not-a-date"><time datetime="2020-06-15">x</time>'),
        # out-of-range month in meta → falls through to URL date
        ("https://b.com/2017/03/09/x", '<meta property="article:published_time" '
         'content="2020-13-40">'),
        # out-of-range URL day → NULL
        ("https://c.com/2017/02/31/x", "<p>n</p>"),
    ]
    got = {
        r.url: (str(r.pub_date) if r.pub_date else None, r.pub_date_source)
        for r in with_pub_date(_pd_pages(spark, rows)).collect()
    }
    assert got["https://a.com/x"] == ("2020-06-15", "time")
    assert got["https://b.com/2017/03/09/x"] == ("2017-03-09", "url")
    assert got["https://c.com/2017/02/31/x"] == (None, None)


def test_pub_date_separate_source_url_col(spark):
    df = spark.createDataFrame(
        [("42", "https://s.com/2015/05/06/p", b"<p>n</p>")],
        "url string, web_url string, html binary",
    )
    r = with_pub_date(df, source_url_col="web_url").first()
    assert str(r.pub_date) == "2015-05-06" and r.pub_date_source == "url"


def test_pub_date_ignores_commented_and_scripted_markup(spark):
    rows = [
        ("https://a.com/x",
         '<!-- <meta property="article:published_time" content="1970-01-01"> -->'
         '<time datetime="2024-05-06">real</time>'),
        ("https://b.com/x",
         '<script>x = \'<time datetime="1999-09-09">\'</script><p>none</p>'),
    ]
    got = {r.url: (str(r.pub_date) if r.pub_date else None, r.pub_date_source)
           for r in with_pub_date(_pd_pages(spark, rows)).collect()}
    assert got["https://a.com/x"] == ("2024-05-06", "time")
    assert got["https://b.com/x"] == (None, None)


def test_pub_date_probes_all_jsonld_blocks(spark):
    """datePublished in a SECOND ld+json block (first is an Organization
    block without it) must still resolve with source 'jsonld'."""
    from edspdf_spark.functions.discover import with_pub_date

    html = (
        "<html><head>"
        '<script type="application/ld+json">{"@type":"Organization","name":"x"}</script>'
        '<script type="application/ld+json">'
        '{"@type":"NewsArticle","datePublished":"2023-04-05T10:00:00Z"}</script>'
        "</head></html>"
    ).encode()
    r = with_pub_date(
        spark.createDataFrame([("u", html)], "url string, html binary")
    ).collect()[0]
    assert str(r.pub_date) == "2023-04-05" and r.pub_date_source == "jsonld"


def test_atom_entry_link_prefers_alternate(spark):
    """rel="self"/enclosure links listed before the article link must not
    win; no-rel means alternate per RFC 4287."""
    from edspdf_spark.functions.discover import parse_feed

    feed = (
        "<feed><entry><title>t</title>"
        '<link rel="self" href="https://feed/entry.xml"/>'
        '<link rel="alternate" href="https://site/post"/>'
        "<id>e1</id></entry>"
        "<entry><title>t2</title>"
        '<link href="https://site/post2"/>'
        "<id>e2</id></entry></feed>"
    )
    df = spark.createDataFrame([("f", feed)], "feed_url string, xml string")
    links = {r.entry_id: r.link for r in parse_feed(df, src_col="feed_url").collect()}
    assert links == {"e1": "https://site/post", "e2": "https://site/post2"}


class TestWalkSitemapTree:
    @staticmethod
    def _tree(spark):
        """index root -> (child index, urlset A) -> urlset B; plus a CYCLE:
        child index references the root again."""
        def sm_index(locs):
            entries = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
            return f"<sitemapindex>{entries}</sitemapindex>"

        def urlset(urls):
            entries = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
            return f"<urlset>{entries}</urlset>"

        docs = {
            "s://root": sm_index(["s://childidx", "s://leafA"]),
            "s://childidx": sm_index(["s://leafB", "s://root"]),  # cycle!
            "s://leafA": urlset(["p://a1", "p://a2"]),
            "s://leafB": urlset(["p://b1"]),
        }

        def fetch(wanted_df):
            rows = [
                (u, docs[u])
                for u in [r["sitemap_url"] for r in wanted_df.collect()]
                if u in docs
            ]
            return spark.createDataFrame(
                rows or [("x", None)], "sitemap_url string, xml string"
            ).where("xml IS NOT NULL")

        roots = spark.createDataFrame(
            [("s://root", docs["s://root"])], "sitemap_url string, xml string"
        )
        return roots, fetch

    def test_walk_collects_all_leaves_once(self, spark):
        from edspdf_spark.functions.discover import walk_sitemap_tree

        roots, fetch = self._tree(spark)
        out = walk_sitemap_tree(roots, fetch, max_depth=5)
        got = sorted((r["loc"], r["depth"]) for r in out.collect())
        # depth 1: leafA's urls (fetched from root's index);
        # depth 2: leafB's urls (fetched from the child index);
        # the cycle back to s://root is NOT re-fetched (visited anti-join)
        assert got == [("p://a1", 1), ("p://a2", 1), ("p://b1", 2)]

    def test_depth_cap_stops_descent(self, spark):
        from edspdf_spark.functions.discover import walk_sitemap_tree

        roots, fetch = self._tree(spark)
        out = walk_sitemap_tree(roots, fetch, max_depth=2)
        assert sorted(r["loc"] for r in out.collect()) == ["p://a1", "p://a2"]

    def test_urlset_root_needs_no_fetch(self, spark):
        from edspdf_spark.functions.discover import walk_sitemap_tree

        roots = spark.createDataFrame(
            [("s://r", "<urlset><url><loc>p://x</loc>"
              "<lastmod>2024-01-02</lastmod></url></urlset>")],
            "sitemap_url string, xml string",
        )
        called = []

        def fetch(df):
            called.append(df.count())
            return df.limit(0).withColumn("xml", F.lit(None).cast("string"))

        out = walk_sitemap_tree(roots, fetch, max_depth=3).collect()
        assert [(r["loc"], r["depth"], r["lastmod"]) for r in out] == [
            ("p://x", 0, "2024-01-02")
        ]
        assert called == []  # no child sitemaps, fetch never invoked


class TestDiscoveryCandidates:
    def test_three_legs_with_precedence(self, spark):
        from edspdf_spark.functions.discover import discovery_candidates

        html = (
            "<html><head>"
            '<link rel="alternate" type="application/rss+xml" href="https://ex.com/feed.xml">'
            "</head><body>"
            '<a href="https://ex.com/page1">one</a> '
            '<a href="https://ex.com/page2/">two</a> '
            '<a href="/relative">rel</a> '
            '<a href="javascript:void(0)">js</a>'
            "</body></html>"
        )
        pages = spark.createDataFrame(
            [("https://ex.com/", html.encode())], "url string, html binary"
        )
        robots = spark.createDataFrame(
            [("ex.com", "User-agent: *\nSitemap: https://ex.com/sitemap.xml\n")],
            "host string, robots_txt string",
        )
        sm = {
            "https://ex.com/sitemap.xml": (
                "<urlset><url><loc>https://ex.com/page1</loc></url>"
                "<url><loc>https://ex.com/from-sitemap</loc></url></urlset>"
            )
        }

        def fetch(df):
            rows = [
                (u, sm[u])
                for u in [r["sitemap_url"] for r in df.collect()]
                if u in sm
            ]
            return spark.createDataFrame(
                rows or [("x", None)], "sitemap_url string, xml string"
            ).where("xml IS NOT NULL")

        out = {
            r["url"]: r["discovered_via"]
            for r in discovery_candidates(
                pages, robots=robots, sitemap_fetch=fetch
            ).collect()
        }
        # canonicalization folds the trailing slash; relative/js dropped
        assert out == {
            "https://ex.com/page1": "sitemap",  # sitemap beats the link leg
            "https://ex.com/page2": "link",
            "https://ex.com/from-sitemap": "sitemap",
            "https://ex.com/feed.xml": "feed",
        }

    def test_without_sitemaps(self, spark):
        from edspdf_spark.functions.discover import discovery_candidates

        pages = spark.createDataFrame(
            [("u", b'<a href="https://a.com/x">x</a>')],
            "url string, html binary",
        )
        out = discovery_candidates(pages).collect()
        assert [(r["url"], r["discovered_via"]) for r in out] == [
            ("https://a.com/x", "link")
        ]

    def test_feeds_into_frontier_recipe(self, spark):
        from edspdf_spark.functions.discover import discovery_candidates
        from edspdf_spark.functions.frontier import frontier_recipe

        links = " ".join(
            f'<a href="https://s{i % 2}.com/p{i}">l</a>' for i in range(8)
        )
        pages = spark.createDataFrame(
            [("u", links.encode())], "url string, html binary"
        )
        cand = discovery_candidates(pages)
        sched = frontier_recipe(
            cand, per_host_cap=3, max_per_cycle=2, id_col="url"
        )
        rows = sched.collect()
        assert len(rows) == 6  # 2 hosts x cap 3
        by_host = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r["fetch_slot"])
        assert all(sorted(v) == [0, 1, 2] for v in by_host.values())


class TestWalkSitemapTreeRedirectKeyedFetch:
    def test_redirect_resolved_keys_do_not_loop(self, spark):
        """A fetch layer keying results by redirect-RESOLVED URLs: the
        root index points at s://alias, which the fetch resolves to
        s://real — whose content references s://alias again (a redirect
        cycle). Without result-side visited tracking this re-fetches and
        re-parses s://real every level until max_depth, duplicating its
        leaf urls."""
        from edspdf_spark.functions.discover import walk_sitemap_tree

        def sm_index(locs):
            entries = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
            return f"<sitemapindex>{entries}</sitemapindex>"

        root_xml = sm_index(["s://alias"])
        real_xml = sm_index(["s://alias"]) + "<urlset><url><loc>p://r1</loc></url></urlset>"

        def fetch(wanted_df):
            wanted = {r["sitemap_url"] for r in wanted_df.collect()}
            rows = []
            if "s://alias" in wanted:
                # redirect: requested s://alias, result keyed s://real
                rows.append(("s://real", real_xml))
            return spark.createDataFrame(
                rows or [("x", None)], "sitemap_url string, xml string"
            ).where("xml IS NOT NULL")

        roots = spark.createDataFrame(
            [("s://root", root_xml)], "sitemap_url string, xml string"
        )
        out = walk_sitemap_tree(roots, fetch, max_depth=6)
        got = sorted((r["loc"], r["depth"]) for r in out.collect())
        # r1 appears exactly once, from the single fetch of s://real
        assert got == [("p://r1", 1)]
