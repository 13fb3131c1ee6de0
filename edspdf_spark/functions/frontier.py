"""Crawl-frontier curation: URL-level quality gating, per-host document
caps, and politeness scheduling.

These are the operators that run BEFORE (and between) fetches in a
Common-Crawl-style pipeline, where they are the cheapest possible
filters — a URL gate costs a few string expressions per row and can
drop a fetch, a parse, and every downstream stage with it:

- :func:`with_url_quality` — RefinedWeb-style URL scoring (Penedo et
  al. 2023, appendix G.1: word-blocklist hits, IP hosts, digit-heavy
  and over-long hostnames, deep subdomain/path nesting) as pure integer
  Catalyst expressions, zero shuffle. Integer milli-point score so the
  DuckDB oracle replays it bit-for-bit.
- :func:`cap_per_host` — domain balancing (the Gopher/RefinedWeb cap on
  documents per registered domain so template farms can't dominate the
  corpus). Two-phase skew-aware: hosts at-or-under the cap pass through
  with NO sort; only over-cap hosts take the per-host top-k window.
- :func:`schedule_frontier` — Nutch-style generate step: per-host fetch
  slots ordered by priority, slot spacing from a per-host crawl-delay
  table (``functions/robots.parse_robots`` emits one), cycle assignment
  from a per-cycle host quota. One host-keyed exchange.

Scale notes (10^12 URLs): the URL gate is a scan-stage projection; the
cap's count aggregation carries map-side partials and the heavy-host
split means the expensive window touches only the skewed tail; the
scheduler's window is per-host — cap the frontier first
(:func:`cap_per_host`) so no single host's slot sort exceeds the cap.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from edspdf_spark.functions.quality import registered_domain

__all__ = [
    "with_url_quality",
    "url_quality_filter",
    "cap_per_host",
    "schedule_frontier",
]

#: host part of a canonical URL (authority, port stripped, lowered)
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
#: path part (between authority and query/fragment)
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?"


def _host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def with_url_quality(
    df: DataFrame,
    url_col: str = "url",
    blockwords: Optional[Sequence[str]] = None,
    keep_threshold_milli: int = 500,
) -> DataFrame:
    """Annotate each row with URL-shape quality signals and an integer
    milli-point score (1000 = clean), RefinedWeb G.1 semantics:

    - ``host`` / ``host_len`` / ``subdomain_depth`` (dot count) /
      ``path_depth`` (slash count past the authority)
    - ``host_digit_milli`` — ``floor(1000·digits/len)`` over the host
    - ``is_ip_host`` — dotted-quad literal host
    - ``url_block_hits`` — how many of ``blockwords`` occur as
      substrings of the lowered URL (presence per word, not counts —
      the RefinedWeb soft-score convention)
    - ``url_quality_milli`` — 1000 minus integer penalties (IP host
      400, 250 per block-word, 40 per subdomain level past 2, 5 per
      host char past 30, 15 per path level past 6, digit-milli/5);
      a URL with NO parseable ``scheme://host`` scores 0 outright
      (unfetchable junk must not sail through the cheapest gate)
    - ``url_keep`` — score ≥ ``keep_threshold_milli``

    Pure scan-stage projection: integer arithmetic only, so the score
    is partitioning-invariant and the oracle replays it exactly.
    """
    url = F.col(url_col)
    low = F.lower(url)
    host = _host(url)
    host_len = F.length(host)
    sub_depth = host_len - F.length(F.replace(host, F.lit("."), F.lit("")))
    path = F.regexp_extract(url, _PATH_RE, 1)
    path_depth = F.length(path) - F.length(
        F.replace(path, F.lit("/"), F.lit(""))
    )
    digits = host_len - F.length(F.regexp_replace(host, r"[0-9]", ""))
    # integers small enough that the double division is exact, so the
    # floor replays bit-for-bit in the DuckDB oracle
    digit_milli = F.when(
        host_len > 0, F.floor(digits * 1000 / host_len)
    ).otherwise(F.lit(0))
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    words = [w.lower() for w in (blockwords or [])]
    if words:
        hits = F.aggregate(
            F.array(*[F.lit(w) for w in words]),
            F.lit(0),
            lambda acc, w: acc + F.when(low.contains(w), 1).otherwise(0),
        )
    else:
        hits = F.lit(0)
    out = (
        df.withColumn("host", host)
        .withColumn("host_len", host_len.cast("long"))
        .withColumn("subdomain_depth", sub_depth.cast("long"))
        .withColumn("path_depth", path_depth.cast("long"))
        .withColumn("host_digit_milli", digit_milli.cast("long"))
        .withColumn("is_ip_host", is_ip)
        .withColumn("url_block_hits", hits.cast("long"))
    )
    score = F.when(
        # no parseable scheme://host — relative hrefs, javascript:,
        # garbage: unfetchable, so the cheapest gate hard-zeros it
        # (otherwise every penalty is vacuously 0 and junk scores 1000)
        F.col("host_len") == 0,
        F.lit(0),
    ).otherwise(
        F.lit(1000)
        - F.when(F.col("is_ip_host"), 400).otherwise(0)
        - F.col("url_block_hits") * 250
        - F.greatest(F.col("subdomain_depth") - 2, F.lit(0)) * 40
        - F.greatest(F.col("host_len") - 30, F.lit(0)) * 5
        - F.greatest(F.col("path_depth") - 6, F.lit(0)) * 15
        - F.floor(F.col("host_digit_milli") / 5)
    ).cast("long")
    return out.withColumn("url_quality_milli", score).withColumn(
        "url_keep", F.col("url_quality_milli") >= F.lit(int(keep_threshold_milli))
    )


def url_quality_filter(
    df: DataFrame,
    url_col: str = "url",
    blockwords: Optional[Sequence[str]] = None,
    keep_threshold_milli: int = 500,
) -> DataFrame:
    """Gate form of :func:`with_url_quality`: keep passing rows, drop
    the signal columns — the first (cheapest) filter of the pipeline."""
    sig = with_url_quality(df, url_col, blockwords, keep_threshold_milli)
    return sig.where(F.col("url_keep")).select(*df.columns)


def cap_per_host(
    df: DataFrame,
    k: int,
    score_col: str,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` rows per registered domain, preferring high
    ``score_col`` (ties broken by ascending ``id_col`` so the survivor
    set is deterministic under any partitioning).

    Skew-aware two-phase plan: one host-keyed count with map-side
    partials finds the >k HEAVY tail (tiny under Zipf — it alone is
    broadcast); light hosts pass through UNSORTED as the broadcast
    ANTI-join complement, heavy hosts take the per-host top-k window.
    The (almost-all-hosts) light list is never materialized or
    broadcast; the window never sees a host that fits under the cap.
    """
    if k < 1:
        raise ValueError(f"cap_per_host needs k >= 1, got {k}")
    d = df.withColumn("_cap_host", registered_domain(F.col(url_col)))
    counts = d.groupBy("_cap_host").agg(F.count(F.lit(1)).alias("_cap_n"))
    # only the HEAVY tail is ever broadcast: under Zipf almost every host
    # is under-cap, so the light-host list is host-cardinality-sized
    # (~10^8 rows at web scale) and must never hit the 8 GB broadcast /
    # driver-collect path — light rows are the ANTI-join complement
    heavy_hosts = counts.where(F.col("_cap_n") > k).select("_cap_host")
    light = d.join(F.broadcast(heavy_hosts), on="_cap_host", how="left_anti")
    w = Window.partitionBy("_cap_host").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    heavy = (
        d.join(F.broadcast(heavy_hosts), on="_cap_host", how="left_semi")
        .withColumn("_cap_rn", F.row_number().over(w))
        .where(F.col("_cap_rn") <= k)
        .drop("_cap_rn")
    )
    return light.unionByName(heavy).drop("_cap_host")


def schedule_frontier(
    df: DataFrame,
    priority_col: str,
    delays: Optional[DataFrame] = None,
    default_delay_ms: int = 1000,
    max_per_cycle: int = 100,
    url_col: str = "url",
) -> DataFrame:
    """Politeness-schedule a fetch frontier: within each registered
    domain, order URLs by (``priority_col`` desc, url asc) and assign

    - ``fetch_slot`` — 0-based position in the host's queue
    - ``fetch_cycle`` — ``slot // max_per_cycle`` (the Nutch "generate"
      batch this URL belongs to; a cycle fetches at most
      ``max_per_cycle`` URLs from one host)
    - ``fetch_offset_ms`` — ``slot · crawl_delay_ms``, the earliest
      polite fetch time relative to the host's first fetch

    ``delays`` is an optional (``host``, ``delay_ms``) frame — e.g. the
    crawl-delay table
    :func:`~edspdf_spark.functions.robots.parse_robots_delays` produces;
    hosts absent from it use ``default_delay_ms``. Delay hosts are
    RE-KEYED here to the same registered domain the schedule partitions
    on (robots tables are keyed by full fetch host — www.example.com —
    which would otherwise silently miss example.com and fall back to the
    default), taking the conservative MAX when several full hosts
    collapse into one domain. The join is host-keyed and the delay table
    is host-cardinality-sized, so Spark broadcasts it. One host-keyed
    exchange for the window; run :func:`cap_per_host` first so no host's
    sort exceeds the cap.
    """
    if max_per_cycle < 1:
        raise ValueError(f"max_per_cycle must be >= 1, got {max_per_cycle}")
    d = df.withColumn("host", registered_domain(F.col(url_col)))
    if delays is not None:
        delays = (
            delays.withColumn(
                "host",
                registered_domain(
                    F.concat(F.lit("http://"), F.col("host"))
                ),
            )
            .groupBy("host")
            .agg(F.max("delay_ms").alias("delay_ms"))
        )
        d = d.join(F.broadcast(delays), on="host", how="left")
        delay = F.coalesce(F.col("delay_ms"), F.lit(int(default_delay_ms)))
        d = d.withColumn("_sched_delay", delay).drop("delay_ms")
    else:
        d = d.withColumn("_sched_delay", F.lit(int(default_delay_ms)))
    w = Window.partitionBy("host").orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    slot = (F.row_number().over(w) - 1).cast("long")
    return (
        d.withColumn("fetch_slot", slot)
        .withColumn(
            "fetch_cycle", F.floor(F.col("fetch_slot") / max_per_cycle).cast("long")
        )
        .withColumn(
            "fetch_offset_ms",
            (F.col("fetch_slot") * F.col("_sched_delay")).cast("long"),
        )
        .drop("_sched_delay")
    )


def frontier_recipe(
    candidates: DataFrame,
    robots: Optional[DataFrame] = None,
    agent: str = "*",
    blockwords: Optional[Sequence[str]] = None,
    keep_threshold_milli: int = 500,
    per_host_cap: int = 1000,
    max_per_cycle: int = 100,
    default_delay_ms: int = 1000,
    priority_col: Optional[str] = None,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """The whole crawl-frontier loop as one call — discovery output in,
    polite fetch schedule out:

    1. :func:`url_quality_filter` — the pre-fetch URL-shape gate (the
       cheapest filter runs first; zero shuffle);
    2. :func:`~edspdf_spark.functions.robots.robots_filter` — drop what
       robots.txt forbids for ``agent`` (skipped when ``robots=None``);
    3. :func:`cap_per_host` — per-registered-domain document cap, scored
       by ``priority_col`` (or by the URL-quality milli-score when no
       priority is given, so cleaner URLs survive the cap);
    4. :func:`schedule_frontier` — per-host fetch slots/cycles, slot
       spacing from the hosts' own ``Crawl-delay`` directives
       (:func:`~edspdf_spark.functions.robots.parse_robots_delays`;
       :func:`schedule_frontier` re-keys full robots hosts to registered
       domains itself), falling back to ``default_delay_ms``.

    Output columns: the input's plus ``host``/``fetch_slot``/
    ``fetch_cycle``/``fetch_offset_ms``. Every stage is the documented
    scale shape of its operator; the recipe adds no shuffles of its own.
    """
    d = with_url_quality(
        candidates, url_col, blockwords, keep_threshold_milli
    )
    prio = priority_col or "url_quality_milli"
    gated = d.where(F.col("url_keep"))
    if robots is not None:
        from edspdf_spark.functions.robots import (
            parse_robots_delays,
            robots_filter,
        )

        gated = robots_filter(gated, robots, agent=agent, url_col=url_col)
        # schedule_frontier re-keys delay hosts to registered domains
        # itself (conservative MAX on collisions)
        delays = parse_robots_delays(robots, agent=agent)
    else:
        delays = None
    capped = cap_per_host(
        gated, per_host_cap, prio, url_col=url_col, id_col=id_col
    )
    drop_signals = [
        "host_len", "subdomain_depth", "path_depth",
        "host_digit_milli", "is_ip_host", "url_block_hits",
        "url_keep", "host",
    ]
    if priority_col is not None:
        # the quality score was only the cap fallback — it is a signal
        # column too and must not leak into the documented output schema
        drop_signals.append("url_quality_milli")
    signal_cols = [
        c
        for c in drop_signals
        if c in capped.columns and c not in candidates.columns
    ]
    scheduled = schedule_frontier(
        capped.drop(*signal_cols),
        prio,
        delays=delays,
        default_delay_ms=default_delay_ms,
        max_per_cycle=max_per_cycle,
        url_col=url_col,
    )
    if priority_col is None:
        scheduled = scheduled.drop("url_quality_milli")
    return scheduled
