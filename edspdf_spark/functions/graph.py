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
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
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
