"""Crawl-frontier curation (`functions/frontier.py`): URL quality
scoring vs hand-computed values + a DuckDB differential, skew-aware
per-host caps, and politeness scheduling — all partitioning-invariant."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from edspdf_spark.functions.frontier import (
    cap_per_host,
    schedule_frontier,
    url_quality_filter,
    with_url_quality,
)

URLS = [
    # (id, url) — shapes chosen to light up each penalty independently
    (0, "https://site0.com/a/b"),                      # clean
    (1, "https://10.1.2.3/x"),                         # IP host
    (2, "https://free-casino.example.com/win"),        # blockword
    (3, "https://a.b.c.d.site1.com/p"),                # deep subdomains
    (4, "https://cdn1234567890.site2.com/img"),        # digit-heavy host
    (5, "https://site3.com/a/b/c/d/e/f/g/h"),          # deep path
    (6, "https://this-is-a-very-long-hostname-indeed.com/"),  # long host
]
BLOCK = ["casino", "viagra"]


@pytest.fixture(scope="module")
def uq(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    rows = with_url_quality(df, blockwords=BLOCK).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_clean_url(uq):
    r = uq[0]
    assert r["host"] == "site0.com"
    assert r["subdomain_depth"] == 1
    assert r["path_depth"] == 2
    assert not r["is_ip_host"]
    assert r["url_block_hits"] == 0
    # 1000 - floor(1000*1/9)/5 = 1000 - floor(111.1)/5 = 1000 - 22
    assert r["url_quality_milli"] == 978
    assert r["url_keep"]


def test_ip_host(uq):
    r = uq[1]
    assert r["is_ip_host"]
    # digits 5 of 8 chars -> 625 milli -> 125 penalty; the dotted quad
    # also counts 3 dots -> (3-2)*40 subdomain penalty on top of the 400
    assert r["host_digit_milli"] == 625
    assert r["url_quality_milli"] == 1000 - 400 - 125 - 40
    assert r["url_keep"] is False


def test_blockword(uq):
    r = uq[2]
    assert r["url_block_hits"] == 1
    assert not r["is_ip_host"]


def test_subdomain_and_digits(uq):
    assert uq[3]["subdomain_depth"] == 5          # a.b.c.d.site1.com
    assert uq[3]["url_quality_milli"] <= 1000 - 3 * 40
    assert uq[4]["host_digit_milli"] > 0


def test_path_and_host_len(uq):
    assert uq[5]["path_depth"] == 8
    assert uq[6]["host_len"] > 30


def test_filter_form(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    kept = url_quality_filter(df, blockwords=BLOCK)
    assert kept.columns == ["doc_id", "url"]
    ids = {r.doc_id for r in kept.collect()}
    assert 0 in ids and 1 not in ids


def test_duckdb_differential(spark, uq):
    """Replay the full integer score in DuckDB for every fixture URL."""
    con = duckdb.connect()
    con.execute("CREATE TABLE u(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", URLS)
    got = con.execute(
        r"""
        WITH h AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                 regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?', 1) AS path
          FROM u
        ), s AS (
          SELECT doc_id,
                 len(host) AS host_len,
                 len(host) - len(replace(host, '.', '')) AS sub_depth,
                 len(path) - len(replace(path, '/', '')) AS path_depth,
                 CASE WHEN len(host) > 0 THEN
                   CAST(floor((len(host) - len(regexp_replace(host, '[0-9]', '', 'g')))
                        * 1000.0 / len(host)) AS BIGINT) ELSE 0 END AS digit_milli,
                 regexp_matches(host, '^\d+\.\d+\.\d+\.\d+$') AS is_ip,
                 (CASE WHEN contains(lower(url), 'casino') THEN 1 ELSE 0 END
                  + CASE WHEN contains(lower(url), 'viagra') THEN 1 ELSE 0 END) AS hits
          FROM h
        )
        SELECT doc_id,
               1000 - CASE WHEN is_ip THEN 400 ELSE 0 END
                    - hits * 250
                    - GREATEST(sub_depth - 2, 0) * 40
                    - GREATEST(host_len - 30, 0) * 5
                    - GREATEST(path_depth - 6, 0) * 15
                    - CAST(floor(digit_milli / 5.0) AS BIGINT) AS score
        FROM s
        """
    ).fetchall()
    for doc_id, score in got:
        assert score == uq[doc_id]["url_quality_milli"], doc_id


# --- cap_per_host ------------------------------------------------------------


@pytest.fixture(scope="module")
def cap_df(spark):
    # host site{i%3}.com; score = doc_id; 9 docs -> 3 per host
    rows = [(i, f"https://www.site{i % 3}.com/p/{i}", i * 10) for i in range(9)]
    # one light host with a single doc
    rows.append((100, "https://lonely.org/x", 1))
    return spark.createDataFrame(rows, "doc_id long, url string, score long")


def test_cap_keeps_topk(cap_df):
    out = cap_per_host(cap_df, k=2, score_col="score").collect()
    ids = sorted(r.doc_id for r in out)
    # per host keep top-2 by score desc: site0 {6,3}, site1 {7,4}, site2 {8,5}
    assert ids == [3, 4, 5, 6, 7, 8, 100]


def test_cap_light_host_passthrough(cap_df):
    out = cap_per_host(cap_df, k=5, score_col="score")
    assert out.count() == 10  # nothing dropped, incl. lonely.org
    assert sorted(out.columns) == sorted(cap_df.columns)


def test_cap_deterministic_ties(spark):
    rows = [(i, "https://t.com/x", 7) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, url string, score long")
    out = sorted(r.doc_id for r in cap_per_host(df, 3, "score").collect())
    assert out == [0, 1, 2]  # tie on score -> ascending doc_id wins


def test_cap_rejects_bad_k(cap_df):
    with pytest.raises(ValueError):
        cap_per_host(cap_df, 0, "score")


def test_cap_partitioning_invariance(cap_df):
    a = sorted(
        r.doc_id
        for r in cap_per_host(cap_df.repartition(7), 2, "score").collect()
    )
    b = sorted(
        r.doc_id for r in cap_per_host(cap_df.coalesce(1), 2, "score").collect()
    )
    assert a == b


# --- schedule_frontier -------------------------------------------------------


@pytest.fixture(scope="module")
def sched_out(spark):
    rows = [(i, f"https://h{i % 2}.com/p{i}", 100 - i) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, url string, prio long")
    delays = spark.createDataFrame(
        [("h0.com", 500)], "host string, delay_ms long"
    )
    out = schedule_frontier(
        df, "prio", delays=delays, default_delay_ms=2000, max_per_cycle=2
    )
    return {r.doc_id: r.asDict() for r in out.collect()}


def test_schedule_slots_follow_priority(sched_out):
    # h0.com holds docs 0,2,4 with prio 100,98,96 -> slots 0,1,2
    assert [sched_out[i]["fetch_slot"] for i in (0, 2, 4)] == [0, 1, 2]
    assert [sched_out[i]["fetch_slot"] for i in (1, 3, 5)] == [0, 1, 2]


def test_schedule_offsets_use_delay_table(sched_out):
    # h0.com has delay 500; h1.com falls back to 2000
    assert sched_out[4]["fetch_offset_ms"] == 2 * 500
    assert sched_out[5]["fetch_offset_ms"] == 2 * 2000


def test_schedule_cycles(sched_out):
    assert sched_out[0]["fetch_cycle"] == 0
    assert sched_out[2]["fetch_cycle"] == 0
    assert sched_out[4]["fetch_cycle"] == 1  # slot 2 // max_per_cycle 2


def test_schedule_partitioning_invariance(spark):
    rows = [(i, f"https://h{i % 3}.com/p{i}", i % 5) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string, prio long")
    a = {
        (r.doc_id, r.fetch_slot, r.fetch_offset_ms)
        for r in schedule_frontier(df.repartition(11), "prio").collect()
    }
    b = {
        (r.doc_id, r.fetch_slot, r.fetch_offset_ms)
        for r in schedule_frontier(df.coalesce(1), "prio").collect()
    }
    assert a == b


# --- frontier_recipe (the composed crawl loop) --------------------------------

from edspdf_spark.functions.frontier import frontier_recipe
from edspdf_spark.functions.robots import parse_robots_delays


def test_parse_robots_delays_precedence_and_max(spark):
    txt_a = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
        "User-agent: mybot\nCrawl-delay: 0.5\nCrawl-delay: 1.5\n"  # max wins
    )
    txt_b = "User-agent: *\nCrawl-delay: junk\n"   # unparseable → omitted
    txt_c = "User-agent: other\nCrawl-delay: 9\n"  # no matching group
    df = spark.createDataFrame(
        [("a.com", txt_a), ("b.com", txt_b), ("c.com", txt_c)],
        "host string, robots_txt string",
    )
    own = {r.host: r.delay_ms for r in parse_robots_delays(df, "MyBot").collect()}
    assert own == {"a.com": 1500}  # own group (max 1.5s) beats * (2s)
    star = {r.host: r.delay_ms for r in parse_robots_delays(df, "*").collect()}
    assert star == {"a.com": 2000}
    filled = {r.host: r.delay_ms
              for r in parse_robots_delays(df, "MyBot", default_delay_ms=777).collect()}
    assert filled == {"a.com": 1500, "b.com": 777, "c.com": 777}


def test_frontier_recipe_end_to_end(spark):
    cand = spark.createDataFrame(
        [
            (0, "https://good.com/a"),
            (1, "https://good.com/b"),
            (2, "https://good.com/c"),          # capped out (cap=2)
            (3, "https://10.1.2.3/x"),           # quality gate drops IP host
            (4, "https://blocked.com/casino/1"),  # robots disallows /casino
            (5, "https://blocked.com/fine"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("good.com", "User-agent: *\nCrawl-delay: 3\nAllow: /\n"),
            ("blocked.com", "User-agent: *\nDisallow: /casino\n"),
        ],
        "host string, robots_txt string",
    )
    got = frontier_recipe(
        cand, robots, per_host_cap=2, default_delay_ms=100
    ).collect()
    by_url = {r.url: r for r in got}
    # survivors: good.com a,b (cap 2, tie-broken by doc_id) + blocked.com/fine
    assert set(by_url) == {
        "https://good.com/a", "https://good.com/b", "https://blocked.com/fine"
    }
    # good.com slots spaced by its Crawl-delay (3s); equal quality → url order
    a, b = by_url["https://good.com/a"], by_url["https://good.com/b"]
    assert (a.fetch_slot, a.fetch_offset_ms) == (0, 0)
    assert (b.fetch_slot, b.fetch_offset_ms) == (1, 3000)
    # blocked.com has no Crawl-delay → default
    f = by_url["https://blocked.com/fine"]
    assert (f.fetch_slot, f.fetch_offset_ms) == (0, 0)
    # schema: input columns + schedule columns, no leaked signal columns
    assert set(got[0].asDict()) == {
        "doc_id", "url", "host", "fetch_slot", "fetch_cycle",
        "fetch_offset_ms",
    }


def test_frontier_recipe_no_robots_and_priority(spark):
    cand = spark.createDataFrame(
        [(0, "https://h.com/a", 5), (1, "https://h.com/b", 9)],
        "doc_id long, url string, prio long",
    )
    got = {r.url: r.fetch_slot
           for r in frontier_recipe(cand, priority_col="prio").collect()}
    assert got == {"https://h.com/b": 0, "https://h.com/a": 1}


def test_url_quality_unparseable_host_scores_zero(spark):
    df = spark.createDataFrame(
        [(0, "not a url at all"), (1, "javascript:void(0)"), (2, "/rel/path"),
         (3, "https://ok.com/x")],
        "doc_id long, url string",
    )
    from edspdf_spark.functions.frontier import with_url_quality

    got = {r.doc_id: (r.url_quality_milli, r.url_keep)
           for r in with_url_quality(df).collect()}
    assert got[0] == (0, False)
    assert got[1] == (0, False)
    assert got[2] == (0, False)
    assert got[3] == (1000, True)


def test_schedule_rekeys_full_robots_hosts(spark):
    # parse_robots_delays emits the FULL fetch host; the schedule
    # partitions on registered domain — the delay must still apply
    from edspdf_spark.functions.frontier import schedule_frontier

    urls = spark.createDataFrame(
        [(0, "https://www.example.com/a", 1), (1, "https://www.example.com/b", 0)],
        "doc_id long, url string, prio long",
    )
    delays = spark.createDataFrame(
        [("www.example.com", 10000), ("static.example.com", 4000)],
        "host string, delay_ms long",
    )
    got = {r.fetch_slot: r.fetch_offset_ms
           for r in schedule_frontier(urls, "prio", delays=delays).collect()}
    assert got == {0: 0, 1: 10000}  # MAX of colliding full hosts, not default


def test_cap_per_host_keeps_distinct_ip_hosts_apart(spark):
    from edspdf_spark.functions.frontier import cap_per_host

    df = spark.createDataFrame(
        [(0, "https://10.0.3.7/a", 1), (1, "https://20.9.3.7/b", 1)],
        "doc_id long, url string, s long",
    )
    assert cap_per_host(df, 1, "s").count() == 2  # two servers, two buckets


def test_frontier_recipe_priority_schema_no_leak(spark):
    cand = spark.createDataFrame(
        [(0, "https://h.com/a", 5)], "doc_id long, url string, prio long"
    )
    row = frontier_recipe(cand, priority_col="prio").first()
    assert set(row.asDict()) == {
        "doc_id", "url", "prio", "host", "fetch_slot", "fetch_cycle",
        "fetch_offset_ms",
    }
