"""robots.txt (RFC 9309 Robots Exclusion Protocol) parsing and frontier
filtering — the crawl-politeness gate every Common-Crawl-style pipeline
applies before fetching or keeping a URL.

Spark-first shape, no UDFs anywhere:

- ``parse_robots`` turns a ``(host, robots_txt)`` corpus into a RULES
  table ``(host, agent, rule_type, pattern)`` with one line explode +
  one host-keyed window (group assembly is inherently sequential per
  file, and a window over the line index IS the relational form of that
  sequence — robots files are tiny, so the per-host partition is bytes,
  not gigabytes).
- ``robots_like_pattern`` compiles a robots path pattern (literal prefix
  + ``*`` wildcards + trailing ``$`` anchor) to a SQL ``LIKE`` pattern:
  ``%``/``_``/escape metachars escaped, ``*`` → ``%``, and a trailing
  ``%`` appended unless the pattern is ``$``-anchored (robots rules are
  prefix rules). ``LIKE`` with a per-row pattern is a plain JVM
  expression — and replays verbatim in the DuckDB oracle.
- ``robots_filter``/``with_robots_verdict`` joins a URL frontier against
  the rules on the HOST key (the natural crawl partitioning; rules per
  host are bounded by the robots file size) and applies RFC 9309
  longest-match semantics: the longest matching pattern wins, ``allow``
  wins length ties, no match ⇒ allowed.

Agent selection follows the RFC: a crawler uses the group whose
``User-agent`` token equals its own (case-insensitive), else the ``*``
group — and a matching group counts even when it holds no allow/disallow
rules (Crawl-delay-only groups suppress ``*``). Empty ``Disallow:``
lines (allow-everything idiom) emit no rule but still terminate a
User-agent run, per the spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def robots_like_pattern(pattern: Column) -> Column:
    """robots path pattern → SQL LIKE pattern (ESCAPE ``\\``):
    escape ``\\``, ``%``, ``_``; ``*`` → ``%``; a trailing ``$`` anchors
    (no trailing ``%``), otherwise the prefix-rule ``%`` is appended."""
    esc = F.replace(pattern, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    wild = F.replace(esc, F.lit("*"), F.lit("%"))
    anchored = wild.endswith("$")
    return F.when(
        anchored, F.substring(wild, 1, F.length(wild) - 1)
    ).otherwise(F.concat(wild, F.lit("%")))


def _robots_groups(
    robots: DataFrame,
    host_col: str,
    robots_col: str,
    kind_map: dict,
) -> DataFrame:
    """Shared RFC 9309 §2.2.1 group assembly: ``(host, robots_txt)`` →
    ``(host, idx, kind, value, grp)``. ``kind_map`` maps lowercased
    directive names to kind tags; ``user-agent`` is always ``ua`` and any
    other directive becomes ``other`` (kept ONLY to terminate a
    User-agent run — a UA line after it starts a NEW group). A group
    starts at a UA line whose previous directive line is not a UA line
    (one ``lag`` + running ``sum`` window over the line index,
    partitioned by host — the only exchange; robots files are tiny).

    EMPTY-VALUE rule lines survive to here on purpose: ``Disallow:``
    with no value (the allow-all idiom) emits no rule but DOES terminate
    a User-agent run — filtering it before assembly merged adjacent
    groups and leaked rules across agents. Callers drop empty values
    when emitting rules."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("idx", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    directive = F.lower(F.trim(F.regexp_extract(clean, r"^([^:]+):", 1)))
    value = F.trim(F.regexp_extract(clean, r"^[^:]+:(.*)$", 1))
    kind = F.when(directive == "user-agent", F.lit("ua"))
    for name, tag in kind_map.items():
        kind = kind.when(directive == name, F.lit(tag))
    kind = kind.when(directive != "", F.lit("other"))
    parsed = lines.select(
        "host", "idx", kind.alias("kind"), value.alias("value")
    ).where(F.col("kind").isNotNull())
    # an empty "User-agent:" is junk — demote it so it terminates runs
    # without opening a group
    parsed = parsed.withColumn(
        "kind",
        F.when(
            (F.col("kind") == "ua") & (F.col("value") == ""), F.lit("other")
        ).otherwise(F.col("kind")),
    )
    w = Window.partitionBy("host").orderBy("idx")
    starts_group = (F.col("kind") == "ua") & (
        F.coalesce(F.lag("kind").over(w), F.lit("")) != "ua"
    )
    return parsed.withColumn(
        "grp", F.sum(starts_group.cast("int")).over(w)
    ).where(F.col("grp") > 0)  # lines before any User-agent line are ignored


def _robots_agents(grouped: DataFrame) -> DataFrame:
    return grouped.where(F.col("kind") == "ua").select(
        "host", "grp", F.lower(F.col("value")).alias("agent")
    )


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """``(host, robots_txt)`` → rules table ``(host, agent, rule_type,
    pattern)`` with ``rule_type ∈ {allow, disallow}`` and ``agent``
    lowercased (``*`` for the catch-all group). Group assembly in
    :func:`_robots_groups`; empty ``Disallow:``/``Allow:`` lines
    terminate groups but emit no rule (RFC 9309 §2.2.2 allow-all
    idiom)."""
    grouped = _robots_groups(
        robots, host_col, robots_col, {"allow": "allow", "disallow": "disallow"}
    )
    agents = _robots_agents(grouped)
    rules = (
        grouped.where(F.col("kind").isin("allow", "disallow"))
        .where(F.col("value") != "")
        .select(
            "host",
            "grp",
            F.col("kind").alias("rule_type"),
            F.col("value").alias("pattern"),
        )
    )
    return agents.join(rules, on=["host", "grp"]).select(
        "host", "agent", "rule_type", "pattern"
    )


def _url_host_path(url: Column) -> tuple[Column, Column]:
    """Lowercased host (port kept — robots scope is per authority) and
    the path+query robots rules match against (``/`` when absent)."""
    after = F.regexp_extract(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    host = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    rest = F.regexp_replace(F.regexp_extract(after, r"^[^/?#]*(.*)$", 1), "#.*$", "")
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    return host, path


def with_robots_verdict(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Append ``robots_allowed`` (boolean) and ``robots_rule`` (the
    winning pattern, NULL when no rule matched) to a URL frontier.

    RFC 9309 evaluation: among the chosen agent group's rules whose
    pattern matches the url path, the LONGEST pattern wins and ``allow``
    wins exact-length ties; a url with no matching rule (or no rules for
    its host) is allowed. Group choice: the crawler's own token if that
    group exists for the host, else ``*``.

    Plan shape: rules parse (one host-keyed window) → frontier LEFT join
    on host (equi-join on the crawl's natural key; a hot host is a plain
    AQE-splittable skew) → LIKE match filter → one url-keyed max_by
    aggregation (partial-aggregatable) → LEFT join back to the frontier.
    No collect, no crossJoin, no UDF.
    """
    grouped = _robots_groups(
        robots, host_col, robots_col, {"allow": "allow", "disallow": "disallow"}
    )
    agents = _robots_agents(grouped)
    rule_rows = (
        grouped.where(F.col("kind").isin("allow", "disallow"))
        .where(F.col("value") != "")
        .select(
            "host",
            "grp",
            F.col("kind").alias("rule_type"),
            F.col("value").alias("pattern"),
        )
    )
    rules = agents.join(rule_rows, on=["host", "grp"]).select(
        "host", "agent", "rule_type", "pattern"
    )
    agent_lc = agent.lower()
    # choose group per host: own token if present, else '*'. Presence is
    # decided from the AGENTS table, not the rules — a matching group
    # with zero allow/disallow lines (e.g. Crawl-delay only) is still the
    # group RFC 9309 says to obey EXCLUSIVELY (⇒ allow-all), and must
    # suppress the '*' group rather than fall through to it
    own_hosts = (
        agents.where(F.col("agent") == agent_lc).select("host").distinct()
    )
    own = rules.where(F.col("agent") == agent_lc)
    star = rules.where(F.col("agent") == "*").join(
        own_hosts, on="host", how="left_anti"
    )
    chosen = own.unionByName(star)

    host, path = _url_host_path(F.col(url_col))
    frontier = urls.select(
        F.col(url_col), host.alias("_rhost"), path.alias("_rpath")
    )
    cand = frontier.join(
        chosen.withColumnRenamed("host", "_rhost"), on="_rhost", how="inner"
    ).where(
        F.like(
            F.col("_rpath"), robots_like_pattern(F.col("pattern")), F.lit("\\")
        )
    )
    verdict = cand.groupBy(url_col).agg(
        F.max_by(
            F.struct(
                (F.col("rule_type") == "allow").alias("allowed"),
                F.col("pattern").alias("rule"),
            ),
            # longest pattern wins; allow beats disallow on equal length
            F.struct(
                F.length("pattern").alias("l"),
                (F.col("rule_type") == "allow").cast("int").alias("a"),
                # deterministic final tie-break: pattern text
                F.col("pattern").alias("p"),
            ),
        ).alias("_v")
    )
    out = urls.join(verdict, on=url_col, how="left")
    return out.select(
        *urls.columns,
        F.coalesce(F.col("_v.allowed"), F.lit(True)).alias("robots_allowed"),
        F.col("_v.rule").alias("robots_rule"),
    )


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Keep only the frontier rows robots.txt allows for ``agent``
    (columns unchanged)."""
    return (
        with_robots_verdict(
            urls,
            robots,
            agent=agent,
            url_col=url_col,
            host_col=host_col,
            robots_col=robots_col,
        )
        .where(F.col("robots_allowed"))
        .select(*urls.columns)
    )


def parse_robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """``(host, robots_txt)`` → ``(host, sitemap_url)``: the ``Sitemap:``
    directives (RFC 9309 §2.3 / sitemaps.org) — the crawl loop's missing
    edge from :func:`parse_robots` (may-I-fetch) to
    :func:`edspdf_spark.functions.discover.parse_sitemap` (what-to-fetch).

    Per the spec the directive is group-independent (it may appear
    anywhere in the file), its key is case-insensitive, and its value is
    an absolute URL. One scan-stage ``regexp_extract_all`` + explode,
    zero UDFs, zero shuffles; comments (``#`` to end-of-line) are
    stripped first so a commented-out directive cannot leak through.
    """
    txt = F.regexp_replace(F.col(robots_col), r"#[^\n]*", "")
    urls = F.regexp_extract_all(
        txt, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(https?://\S+)"), 1
    )
    return robots.select(
        F.col(host_col).alias("host"),
        F.explode(urls).alias("sitemap_url"),
    )


def parse_robots_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    default_delay_ms: "int | None" = None,
) -> DataFrame:
    """``(host, robots_txt)`` → ``(host, delay_ms)``: the ``Crawl-delay``
    directive (de-facto standard outside RFC 9309; seconds, possibly
    fractional), group-scoped exactly like allow/disallow — the named
    agent's group wins over the ``*`` group, and within a class the MAX
    delay is kept (the politeness-conservative read of a contradictory
    file). Hosts with no parseable directive are omitted (or emitted
    with ``default_delay_ms`` when given) — feed the result straight
    into :func:`edspdf_spark.functions.frontier.schedule_frontier`.

    Same relational group assembly as :func:`parse_robots` (one lag+sum
    window per host), then a two-column conditional max — no UDFs.
    """
    agent = agent.lower()
    grouped = _robots_groups(
        robots, host_col, robots_col, {"crawl-delay": "delay"}
    )
    agents = _robots_agents(grouped)
    secs = F.col("value").try_cast("double")
    delays = (
        grouped.where(F.col("kind") == "delay")
        .withColumn("_s", secs)
        .where(F.col("_s").isNotNull() & (F.col("_s") >= 0))
        .select("host", "grp", "_s")
    )
    joined = agents.join(delays, on=["host", "grp"])
    per_host = joined.groupBy("host").agg(
        F.max(F.when(F.col("agent") == agent, F.col("_s"))).alias("_own"),
        F.max(F.when(F.col("agent") == "*", F.col("_s"))).alias("_star"),
    )
    picked = F.coalesce(F.col("_own"), F.col("_star"))
    out = (
        per_host.where(picked.isNotNull())
        .select("host", (picked * 1000).cast("long").alias("delay_ms"))
    )
    if default_delay_ms is None:
        return out
    return (
        robots.select(F.col(host_col).alias("host"))
        .distinct()
        .join(out, on="host", how="left")
        .select(
            "host",
            F.coalesce(
                F.col("delay_ms"), F.lit(int(default_delay_ms))
            ).alias("delay_ms"),
        )
    )
