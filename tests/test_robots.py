"""robots.txt parsing + RFC 9309 longest-match frontier filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from edspdf_spark.functions.robots import (
    parse_robots,
    robots_filter,
    with_robots_verdict,
)

ROBOTS_A = """\
# crawl policy
User-agent: googlebot
User-agent: bingbot
Disallow: /private/
Allow: /private/ok*

User-agent: *
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /
Disallow:
"""

ROBOTS_B = """\
Disallow: /before-any-group/
User-agent: *
Disallow: /a_b
"""


def _robots(spark):
    return spark.createDataFrame(
        [("a.test", ROBOTS_A), ("b.test", ROBOTS_B)],
        "host string, robots_txt string",
    )


def test_parse_robots_groups(spark):
    rules = sorted(
        (r.host, r.agent, r.rule_type, r.pattern)
        for r in parse_robots(_robots(spark)).collect()
    )
    # both UA lines of group 1 share its two rules; empty Disallow dropped;
    # rules before any User-agent line are ignored
    assert rules == [
        ("a.test", "*", "allow", "/"),
        ("a.test", "*", "disallow", "/*.pdf$"),
        ("a.test", "*", "disallow", "/tmp/"),
        ("a.test", "bingbot", "allow", "/private/ok*"),
        ("a.test", "bingbot", "disallow", "/private/"),
        ("a.test", "googlebot", "allow", "/private/ok*"),
        ("a.test", "googlebot", "disallow", "/private/"),
        ("b.test", "*", "disallow", "/a_b"),
    ]


def _verdicts(spark, urls, agent):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = with_robots_verdict(df, _robots(spark), agent=agent)
    return {r.url: (r.robots_allowed, r.robots_rule) for r in out.collect()}


def test_longest_match_and_anchor(spark):
    got = _verdicts(
        spark,
        [
            "http://a.test/private/secret",  # disallow /private/
            "http://a.test/private/okfile",  # allow /private/ok* (longer)
            "http://a.test/tmp/x",  # disallow /tmp/ beats allow /
            "http://a.test/doc.pdf",  # $-anchored disallow
            "http://a.test/doc.pdfx",  # anchor must NOT fire
            "http://a.test/page",  # allow /
            "http://nohost.test/x",  # no robots → allowed
        ],
        agent="googlebot",
    )
    assert got["http://a.test/private/secret"] == (False, "/private/")
    assert got["http://a.test/private/okfile"] == (True, "/private/ok*")
    # googlebot group exists for a.test → the * group's /tmp/ rule does
    # NOT apply to googlebot (RFC: exactly one group governs a crawler)
    assert got["http://a.test/tmp/x"][0] is True
    # the $-anchored pdf rule lives in the * group, which googlebot ignores
    assert got["http://a.test/doc.pdf"][0] is True
    assert got["http://a.test/doc.pdfx"][0] is True
    assert got["http://a.test/page"][0] is True
    assert got["http://nohost.test/x"] == (True, None)


def test_star_group_and_fallback_agent(spark):
    got = _verdicts(
        spark,
        [
            "http://a.test/tmp/x",
            "http://a.test/doc.pdf",
            "http://a.test/doc.pdfx",
            "http://a.test/private/secret",  # * group has no /private/ rule
            "http://b.test/a_b",
            "http://b.test/axb",  # '_' must stay literal, not LIKE wildcard
        ],
        agent="mybot",  # not listed anywhere → '*' group
    )
    assert got["http://a.test/tmp/x"] == (False, "/tmp/")
    assert got["http://a.test/doc.pdf"] == (False, "/*.pdf$")
    assert got["http://a.test/doc.pdfx"] == (True, "/")
    assert got["http://a.test/private/secret"] == (True, "/")
    assert got["http://b.test/a_b"][0] is False
    assert got["http://b.test/axb"] == (True, None)


def test_allow_wins_length_tie(spark):
    robots = spark.createDataFrame(
        [("t.test", "User-agent: *\nAllow: /page\nDisallow: /page\n")],
        "host string, robots_txt string",
    )
    df = spark.createDataFrame([("http://t.test/page/x",)], "url string")
    row = with_robots_verdict(df, robots).collect()[0]
    assert row.robots_allowed is True


def test_robots_filter_keeps_columns(spark):
    urls = spark.createDataFrame(
        [(1, "http://a.test/tmp/x"), (2, "http://a.test/fine")],
        "doc_id int, url string",
    )
    kept = robots_filter(urls, _robots(spark), agent="mybot")
    assert kept.columns == ["doc_id", "url"]
    assert [r.doc_id for r in kept.collect()] == [2]


# --- Sitemap: directives ------------------------------------------------------

from edspdf_spark.functions.robots import parse_robots_sitemaps


def test_robots_sitemap_directives(spark):
    txt_a = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://a.com/sitemap.xml\n"
        "sitemap: https://a.com/news.xml\n"          # case-insensitive key
        "# Sitemap: https://a.com/commented.xml\n"   # commented out
        "Sitemap: https://a.com/tail.xml # trailing comment\n"
    )
    txt_b = "User-agent: x\nAllow: /\n"  # none
    df = spark.createDataFrame(
        [("a.com", txt_a), ("b.com", txt_b)], "host string, robots_txt string"
    )
    got = sorted(
        (r.host, r.sitemap_url) for r in parse_robots_sitemaps(df).collect()
    )
    assert got == [
        ("a.com", "https://a.com/news.xml"),
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://a.com/tail.xml"),
    ]


def test_robots_delays_group_not_merged_across_rules(spark):
    from edspdf_spark.functions.robots import parse_robots_delays

    # the '*' group's Disallow line must terminate its UA run: slowbot's
    # Crawl-delay belongs to slowbot ONLY
    txt = "User-agent: *\nDisallow: /admin\n\nUser-agent: slowbot\nCrawl-delay: 30\n"
    df = spark.createDataFrame([("a.com", txt)], "host string, robots_txt string")
    assert parse_robots_delays(df, "*").collect() == []
    got = {r.host: r.delay_ms for r in parse_robots_delays(df, "slowbot").collect()}
    assert got == {"a.com": 30000}


def test_robots_rules_group_not_merged_across_crawl_delay(spark):
    # a Crawl-delay line between UA runs must terminate the first group:
    # botb's Disallow must NOT apply to bota
    from edspdf_spark.functions.robots import with_robots_verdict

    txt = "User-agent: bota\nCrawl-delay: 1\nUser-agent: botb\nDisallow: /x\n"
    robots = spark.createDataFrame([("a.com", txt)], "host string, robots_txt string")
    urls = spark.createDataFrame([("https://a.com/x1",)], "url string")
    ra = with_robots_verdict(urls, robots, agent="bota").first()
    rb = with_robots_verdict(urls, robots, agent="botb").first()
    assert ra.robots_allowed is True
    assert rb.robots_allowed is False


def test_empty_disallow_terminates_group(spark):
    """RFC 9309: 'Disallow:' with no value is the allow-all idiom — it
    emits no rule but still ENDS the agent's group, so the next
    User-agent line starts a fresh group and rules don't leak."""
    from edspdf_spark.functions.robots import parse_robots, with_robots_verdict

    robots = spark.createDataFrame(
        [("h", "User-agent: a\nDisallow:\n\nUser-agent: b\nDisallow: /private")],
        "host string, robots_txt string",
    )
    rules = {
        (r.agent, r.rule_type, r.pattern) for r in parse_robots(robots).collect()
    }
    assert rules == {("b", "disallow", "/private")}
    urls = spark.createDataFrame([("http://h/private/x",)], "url string")
    va = with_robots_verdict(urls, robots, agent="a").collect()[0]
    vb = with_robots_verdict(urls, robots, agent="b").collect()[0]
    assert va.robots_allowed is True   # a's group is allow-all
    assert vb.robots_allowed is False


def test_empty_disallow_terminates_delay_group(spark):
    from edspdf_spark.functions.robots import parse_robots_delays

    robots = spark.createDataFrame(
        [("h", "User-agent: a\nDisallow:\n\nUser-agent: b\nCrawl-delay: 30")],
        "host string, robots_txt string",
    )
    a = parse_robots_delays(robots, agent="a").collect()
    b = parse_robots_delays(robots, agent="b").collect()
    assert a == []                      # no delay for agent a
    assert [(r.host, r.delay_ms) for r in b] == [("h", 30000)]


def test_ruleless_own_group_suppresses_star(spark):
    """A matching User-agent group must be obeyed EXCLUSIVELY even when
    it carries no allow/disallow rules (e.g. Crawl-delay only) — the
    crawler does not fall through to the '*' group."""
    from edspdf_spark.functions.robots import with_robots_verdict

    robots = spark.createDataFrame(
        [("h2", "User-agent: mybot\nCrawl-delay: 5\n\nUser-agent: *\nDisallow: /")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame([("http://h2/page",)], "url string")
    mine = with_robots_verdict(urls, robots, agent="mybot").collect()[0]
    other = with_robots_verdict(urls, robots, agent="otherbot").collect()[0]
    assert mine.robots_allowed is True
    assert other.robots_allowed is False
