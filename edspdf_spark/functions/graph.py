"""Web link-graph operators: href extraction and fixed-point PageRank.

A crawl-scale corpus engine needs the link graph for crawl prioritization,
spam/domain weighting, and dedup canonicalization (prefer the
higher-authority copy). Two operators:

* :func:`extract_links` — ``(url, html)`` → ``(src, dst)`` edges via a
  single JVM-side ``regexp_extract_all`` over the page bytes (zero
  Python, zero shuffle; the regex is in the Java∩RE2 common dialect so
  the DuckDB oracle replays it).
* :func:`pagerank` — iterative PageRank in **exact fixed-point integer
  arithmetic**: ranks are BIGINT micro-units (``SCALE = 10^12`` ≙ mass
  1.0), each update is ``r' = (3·SCALE) div 20 + (17 · Σ (r(u) div
  outdeg(u))) div 20`` for damping 0.85. Integer sums are associative,
  so the result is bit-identical regardless of partitioning / AQE /
  executor count — float PageRank cannot promise that (double addition
  order varies run to run), and an engine whose dedup canonicalization
  depends on rank order must be deterministic.

Scale notes (10^12 pages):

- Each iteration is one ``(node)``-keyed aggregation of edge
  contributions plus one join back to the rank frame — the standard
  Pregel-style shape; edges are re-used across iterations and the rank
  frame is ``localCheckpoint``-ed per round so the logical plan stays
  O(1) deep instead of O(iterations) (same lineage-truncation pattern as
  ``functions/dedup.py::dedup_components``).
- Skewed in-degree (hub pages) is a map-side-combine friendly SUM — the
  partial aggregation bounds hot-key pressure; out-degree skew never
  shuffles (contribution is computed row-wise).
- Dangling nodes (no out-links) keep receiving the teleport base; their
  mass is NOT redistributed (the common "dangling mass dropped" variant —
  documented so the oracle matches by construction).
- Self-loops and duplicate edges are removed up front (one distinct);
  rank therefore depends only on the simple directed graph.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_links",
    "extract_anchors",
    "anchor_text_rollup",
    "pagerank",
    "pagerank_oracle_sql",
    "hits",
    "hits_oracle_sql",
    "HREF_RE",
    "ANCHOR_RE",
    "SCALE",
]

# Java ∩ RE2 common dialect (no lookaround/backrefs) — DuckDB replays it.
HREF_RE = r"href=\"([^\"]+)\""
#: <a href="…">text</a> with a simple (non-nested) anchor body
ANCHOR_RE = r"<a [^>]*href=\"([^\"]+)\"[^>]*>([^<]*)</a>"

SCALE = 10**12  # 1.0 of rank mass, in micro-units
_D_NUM, _D_DEN = 17, 20  # damping 0.85 as an exact rational


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    charset: str = "utf-8",
) -> DataFrame:
    """``(url, html)`` → one ``(src, dst)`` row per ``href="…"`` occurrence,
    document order preserved within a page. ``html`` may be binary or
    string; decode + extract is a single scan-stage projection."""
    html = F.col(html_col)
    dtype = dict(pages.dtypes)[html_col]
    if dtype == "binary":
        html = F.decode(html, charset)
    return pages.select(
        F.col(url_col).alias("src"),
        F.explode(F.regexp_extract_all(html, F.lit(HREF_RE), F.lit(1))).alias("dst"),
    )


def extract_anchors(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    charset: str = "utf-8",
) -> DataFrame:
    """``(url, html)`` → one ``(src, dst, anchor)`` row per
    ``<a href="…">text</a>`` occurrence (anchor whitespace-normalized,
    may be empty). Two ``regexp_extract_all`` passes over the same
    pattern (Java regex extracts one group per call) zipped positionally
    — still a single scan-stage projection, zero Python, zero shuffle;
    the pattern is in the Java∩RE2 common dialect so the DuckDB oracle
    replays it."""
    html = F.col(html_col)
    dtype = dict(pages.dtypes)[html_col]
    if dtype == "binary":
        html = F.decode(html, charset)
    pair = F.explode(
        F.arrays_zip(
            F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(1)).alias("dst"),
            F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(2)).alias("anchor"),
        )
    )
    return pages.select(F.col(url_col).alias("src"), pair.alias("_a")).select(
        "src",
        F.col("_a.dst").alias("dst"),
        F.trim(F.regexp_replace(F.col("_a.anchor"), r"\s+", " ")).alias("anchor"),
    )


def anchor_text_rollup(
    anchors: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Inbound anchor-text features per target: ``(dst, n_inlinks,
    n_srcs, top_anchor, top_anchor_count)`` where ``top_anchor`` is the
    most frequent non-empty inbound anchor text (ties → lexicographically
    smallest). The classic web-corpus signal: how the web DESCRIBES a
    page, independent of the page's own content.

    ``n_inlinks``/``n_srcs`` count every inbound link (anchor may be
    empty); ``top_anchor`` considers non-empty texts only (NULL when a
    page has none).

    Plan shape: one ``dst``-keyed count/count-distinct aggregation, one
    ``(dst, anchor)``-keyed count aggregation (map-side partial combine
    bounds hub-page hot keys) reduced by a ``dst``-keyed ``min_by`` over
    ``(−count, anchor)`` — partial-aggregatable, so no window sort over
    the corpus and nothing is ever collected per key (a mega-hub with
    millions of distinct anchors still reduces pairwise) — then one
    ``dst``-keyed join of the two small result frames."""
    base = anchors.groupBy(dst_col).agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.count_distinct(src_col).alias("n_srcs"),
    )
    per_pair = (
        anchors.where(F.col(anchor_col) != "")
        .groupBy(dst_col, anchor_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = per_pair.groupBy(dst_col).agg(
        F.min_by(
            F.col(anchor_col), F.struct((-F.col("cnt")).alias("nc"), anchor_col)
        ).alias("top_anchor"),
        F.max("cnt").alias("top_anchor_count"),
    )
    return base.join(top, on=dst_col, how="left")


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list.

    Returns ``(node, rank_micro BIGINT, rank DOUBLE)`` where ``rank =
    rank_micro / 10^12`` (the double is a single division of an exact
    integer — still deterministic). Initial rank is ``SCALE div N`` for
    ``N`` distinct nodes; every update is exact integer arithmetic (see
    module docstring), so two runs at any parallelism agree bit-for-bit
    and a sequential-SQL oracle replays the computation exactly.

    ``checkpoint=False`` keeps the whole loop lazy (useful for plan
    inspection at tiny scale); the default truncates lineage per round.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint()
    else:
        e = e.persist()

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # nodes and outdeg are loop-invariant but feed a join in EVERY round —
    # without truncation each round re-runs the union/distinct (resp.
    # groupBy) over the full edge list: iterations+1 redundant corpus-wide
    # shuffles at web scale. Same discipline as hits() below.
    nodes = nodes.localCheckpoint() if checkpoint else nodes.persist()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    if checkpoint:
        outdeg = outdeg.localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_micro"),
            F.lit(0.0).alias("rank"),
        )

    base = (3 * SCALE) // _D_DEN  # (1-d)·SCALE exactly
    ranks = nodes.select("node", F.expr(f"{SCALE} div {n}").alias("rank_micro"))
    if checkpoint:
        ranks = ranks.localCheckpoint()

    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = nodes.select("node").join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({_D_NUM} * coalesce(incoming, 0L)) div {_D_DEN}")
            ).alias("rank_micro"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()

    return ranks.select(
        "node",
        "rank_micro",
        (F.col("rank_micro") / F.lit(float(SCALE))).alias("rank"),
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Kleinberg HITS hubs & authorities in exact fixed-point integers.

    Per round (classic update order): ``auth'(v) = Σ_{u→v} hub(u)`` then
    ``hub'(u) = Σ_{u→v} auth'(v)``, each rescaled back under ``SCALE`` by
    ``x div ceil(max(x) / SCALE)`` — an exact integer division against a
    global max (one tiny broadcast per round) that never widens past the
    sum itself (``x·SCALE div max`` would overflow BIGINT), replacing the
    float L2 normalization so the result is bit-identical under any
    partitioning and replayable by an unrolled-CTE SQL oracle. Nodes with
    no inbound (outbound) edges hold authority (hub) 0.

    Returns ``(node, auth_micro, hub_micro)``. Overflow bound: a sum is
    ≤ degree·SCALE, so BIGINT is safe while max in/out-degree < 9·10⁶ at
    the default SCALE=10¹² (lower SCALE for spammier graphs). Per round:
    two node-keyed join+SUM aggregations (map-side combined) and two
    single-row max aggregations; ``localCheckpoint`` truncates lineage.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = e.localCheckpoint() if checkpoint else e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint()

    hub = nodes.select("node", F.lit(SCALE).cast("long").alias("hub_micro"))
    # iterations=0 returns the initial state (hub=SCALE, auth=0) instead of
    # crashing on a None join below — mirrors pagerank's n=0 grace.
    auth = nodes.select("node", F.lit(0).cast("long").alias("auth_micro"))
    for _ in range(iterations):
        raw_auth = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_micro").alias("x"))
        )
        m_a = raw_auth.agg(F.max("x").alias("m"))
        auth = (
            nodes.join(raw_auth, "node", "left")
            .crossJoin(F.broadcast(m_a))
            .select(
                "node",
                F.expr(
                    f"coalesce(x, 0L) div greatest((coalesce(m, 0L)"
                    f" + {SCALE - 1}) div {SCALE}, 1L)"
                ).alias("auth_micro"),
            )
        )
        if checkpoint:
            auth = auth.localCheckpoint()
        raw_hub = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_micro").alias("x"))
        )
        m_h = raw_hub.agg(F.max("x").alias("m"))
        hub = (
            nodes.join(raw_hub, "node", "left")
            .crossJoin(F.broadcast(m_h))
            .select(
                "node",
                F.expr(
                    f"coalesce(x, 0L) div greatest((coalesce(m, 0L)"
                    f" + {SCALE - 1}) div {SCALE}, 1L)"
                ).alias("hub_micro"),
            )
        )
        if checkpoint:
            hub = hub.localCheckpoint()
    return nodes.join(auth, "node", "left").join(hub, "node", "left").select(
        "node",
        F.coalesce("auth_micro", F.lit(0)).cast("long").alias("auth_micro"),
        F.coalesce("hub_micro", F.lit(0)).cast("long").alias("hub_micro"),
    )


def hits_oracle_sql(
    edges_sql: str,
    iterations: int = 3,
) -> str:
    """DuckDB replica of :func:`hits` — the same exact integer recurrence
    unrolled as chained CTEs, bit-level match."""
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"h0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS hub FROM nodes)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""ra{i} AS (
  SELECT e.dst AS node, SUM(h{i}.hub) AS x
  FROM e JOIN h{i} ON e.src = h{i}.node GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""a{i + 1} AS (
  SELECT nodes.node,
         COALESCE(ra{i}.x, 0) // GREATEST(
           ((SELECT COALESCE(MAX(x), 0) FROM ra{i}) + {SCALE - 1}) // {SCALE}, 1)
           AS auth
  FROM nodes LEFT JOIN ra{i} ON nodes.node = ra{i}.node
)"""
        )
        ctes.append(
            f"""rh{i} AS (
  SELECT e.src AS node, SUM(a{i + 1}.auth) AS x
  FROM e JOIN a{i + 1} ON e.dst = a{i + 1}.node GROUP BY e.src
)"""
        )
        ctes.append(
            f"""h{i + 1} AS (
  SELECT nodes.node,
         COALESCE(rh{i}.x, 0) // GREATEST(
           ((SELECT COALESCE(MAX(x), 0) FROM rh{i}) + {SCALE - 1}) // {SCALE}, 1)
           AS hub
  FROM nodes LEFT JOIN rh{i} ON nodes.node = rh{i}.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT nodes.node,
       CAST(COALESCE(a{iterations}.auth, 0) AS BIGINT) AS auth_micro,
       CAST(COALESCE(h{iterations}.hub, 0) AS BIGINT) AS hub_micro
FROM nodes
LEFT JOIN a{iterations} ON nodes.node = a{iterations}.node
LEFT JOIN h{iterations} ON nodes.node = h{iterations}.node
"""
    )


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    node_type: str = "BIGINT",
) -> str:
    """DuckDB replica of :func:`pagerank`: ``edges_sql`` is a subquery
    yielding ``(src, dst)``. The iteration loop is unrolled into chained
    CTEs (``r0 … r{k}``) — same exact integer recurrence, so the match is
    bit-level, not approximate."""
    base = (3 * SCALE) // _D_DEN
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "n AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, {SCALE} // (SELECT n FROM n) AS rank_micro FROM nodes)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""r{i + 1} AS (
  SELECT nodes.node,
         CAST({base} + ({_D_NUM} * COALESCE(inc.incoming, 0)) // {_D_DEN} AS BIGINT)
           AS rank_micro
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, SUM(r{i}.rank_micro // outdeg.outdeg) AS incoming
    FROM e JOIN r{i} ON e.src = r{i}.node JOIN outdeg ON e.src = outdeg.src
    GROUP BY e.dst
  ) inc ON nodes.node = inc.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_micro, rank_micro / {float(SCALE)} AS rank"
        f" FROM r{iterations}"
    )


def extract_text_urls(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bare http(s) URLs in PLAIN text → one ``(id_col, url)`` row each —
    the link-graph feed for non-HTML corpora (markdown, chat logs,
    extracted body text) where :func:`extract_links` has no ``href`` to
    read. Scan-stage ``regexp_extract_all`` + explode (Java∩RE2∩DuckDB
    dialect), with the conventional trailing-punctuation trim
    (``. , ; : ! ?``) so sentence-final URLs come out clean.
    """
    urls = F.regexp_extract_all(
        F.col(text_col), F.lit(r"(?i)\bhttps?://[^\s<>\"')\]}]+"), 0
    )
    trimmed = F.transform(
        urls, lambda u: F.regexp_replace(u, r"[.,;:!?]+$", "")
    )
    return df.select(
        id_col, F.explode(trimmed).alias("url")
    )
