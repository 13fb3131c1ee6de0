"""A2/A4/A5 — spatial-join alignment family (the fork's workhorse).

All variants share one matching core (same as P3): score every (dst bloc,
src box) pair on the page by covered-src-ratio, gate by covered-dst-ratio ≥
threshold, argmax with first-src-wins ties (reference
``edspdf/utils/alignment.py:118-257,371-495``,
``edspdf/utils/lines_partition.py:14-158``).

Relational re-expression: a join on (url, page) — the src side is per-doc
annotation boxes, so this is an equi-join on url, NOT a broadcast — then the
same window argmax as the mask classifier, then:

* A2 ``align_box_labels_bioul``: per matched src-box group, tag lines
  B/I/L/U by their position in document order —
  ``row_number``/``count`` over the group window (alignment.py:180-199).
  (The reference's final flatten has a scoping bug that returns the last
  group's lines repeated; the observable semantics — the in-place
  B/I/L/U label mutation on the dst boxes — is what we reproduce.)
* A4 ``align_box_labels_order_ba_pkl``: composite label
  ``{label}|{node_num}|{rank}``, pollution → ``{pollution}|-1|-1``
  (alignment.py:455-478).
* A5 ``partition_lines_in_boxes``: per src box, assemble a text block with
  label-dependent templates (lines_partition.py:88-107).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ALIGN_INF = 100000.0

_BLOC_KEY = ["url", "page_num", "bloc_ord"]


def _match_src(
    blocs: DataFrame,
    src: DataFrame,
    threshold: float,
    broadcast_src: bool = False,
) -> DataFrame:
    """Match each non-error bloc to its argmax src box.

    ``src`` columns: url, page_num (nullable), x0, y0, x1, y1, label, plus
    optional extras (node_num, rank, …); ``src_ord`` = insertion order per
    (url, page scope). Returns blocs + ``s_id`` (NULL = catch-all/pollution
    match) and the matched src columns prefixed ``s_``.
    """
    s = src.select(
        F.col("url").alias("s_url"),
        F.col("page_num").alias("s_page"),
        F.col("x0").alias("s_x0"),
        F.col("y0").alias("s_y0"),
        F.col("x1").alias("s_x1"),
        F.col("y1").alias("s_y1"),
        F.col("label").alias("s_label"),
        F.col("src_ord").alias("s_ord"),
        *[
            F.col(c).alias(f"s_{c}")
            for c in src.columns
            if c not in ("url", "page_num", "x0", "y0", "x1", "y1", "label", "src_ord")
        ],
    )
    if broadcast_src:
        s = F.broadcast(s)

    good = blocs.filter(~F.col("error"))
    cond = (
        (F.col("url") == F.col("s_url"))
        & (
            F.col("s_page").isNull()
            | F.col("page_num").isNull()
            | (F.col("s_page") == F.col("page_num"))
        )
    )
    joined = good.join(s, on=cond, how="left")

    dx = F.least("s_x1", "x1") - F.greatest("s_x0", "x0")
    dy = F.least("s_y1", "y1") - F.greatest("s_y0", "y0")
    overlap = F.greatest(dx, F.lit(0.0)) * F.greatest(dy, F.lit(0.0))
    src_area_raw = (F.col("s_x1") - F.col("s_x0")) * (F.col("s_y1") - F.col("s_y0"))
    dst_area_raw = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    src_area = F.when(src_area_raw == 0.0, F.lit(1.0)).otherwise(src_area_raw)
    dst_area = F.when(dst_area_raw == 0.0, F.lit(1.0)).otherwise(dst_area_raw)

    # The implicit catch-all box (-INF..INF) participates in the argmax as
    # one more src row (alignment.py:28-34); its overlap with a dst box is
    # the dst box's own clipped area, its covered-dst-ratio therefore 1 for
    # positive-area boxes and 0 for degenerate ones. Ranked last, it wins
    # only on a STRICTLY greater score.
    catch_overlap = F.greatest(F.col("x1") - F.col("x0"), F.lit(0.0)) * F.greatest(
        F.col("y1") - F.col("y0"), F.lit(0.0)
    )
    catch_score = F.when(
        catch_overlap / dst_area < F.lit(float(threshold)), F.lit(0.0)
    ).otherwise(catch_overlap / F.lit((2.0 * ALIGN_INF) * (2.0 * ALIGN_INF)))
    pair_score = F.when(
        overlap / dst_area < F.lit(float(threshold)), F.lit(0.0)
    ).otherwise(overlap / src_area)

    scored = joined.withColumn("m_pair_score", pair_score).withColumn(
        "m_catch_score", catch_score
    )

    w = Window.partitionBy(*_BLOC_KEY)
    ranked = (
        scored.withColumn(
            "m_rn",
            F.row_number().over(
                w.orderBy(F.col("m_pair_score").desc(), F.col("s_ord").asc_nulls_last())
            ),
        )
        .filter(F.col("m_rn") == 1)
        # blocs on pages with no src at all are dropped (alignment.py:20-21)
        .filter(F.col("s_ord").isNotNull())
    )
    # catch-all wins when even the best real score loses to it
    won_catch = F.col("m_catch_score") > F.col("m_pair_score")
    return ranked.withColumn(
        "s_matched", ~won_catch
    ).drop("m_rn", "m_pair_score", "m_catch_score", "s_url")


def align_bioul(
    blocs: DataFrame,
    src: DataFrame,
    threshold: float = 0.0001,
) -> DataFrame:
    """A2: B/I/L/U tag per bloc from its matched src-box group.

    Output = bloc columns with ``label`` ∈ {B, I, L, U} plus ``is_begin`` /
    ``is_last`` (reference alignment.py:180-199 mutates the dst boxes this
    way; blocs matched to NO group — impossible since pollution is a group —
    keep their tag). Groups are per (url, page, matched src | pollution).
    """
    m = _match_src(blocs, src, threshold)
    group_id = F.when(F.col("s_matched"), F.col("s_ord")).otherwise(F.lit(-1))
    m = m.withColumn("m_gid", group_id)
    gw = Window.partitionBy("url", "page_num", "m_gid")
    tagged = (
        m.withColumn("m_grn", F.row_number().over(gw.orderBy(F.col("bloc_ord").asc())))
        .withColumn("m_gcnt", F.count(F.lit(1)).over(gw))
        .withColumn(
            "label",
            F.when(F.col("m_gcnt") == 1, F.lit("U"))
            .when(F.col("m_grn") == 1, F.lit("B"))
            .when(F.col("m_grn") == F.col("m_gcnt"), F.lit("L"))
            .otherwise(F.lit("I")),
        )
        .withColumn("is_begin", F.col("m_grn") == 1)
        .withColumn("is_last", F.col("m_grn") == F.col("m_gcnt"))
    )
    bloc_cols = [c for c in blocs.columns]
    return tagged.select(*bloc_cols, "is_begin", "is_last")


def align_plain(
    blocs: DataFrame,
    src: DataFrame,
    threshold: float = 0.0001,
    pollution_label: Optional[str] = None,
) -> DataFrame:
    """A3 ``align_box_labels_bl_pkl`` (reference ``utils/alignment.py:265-363``):
    the A1 join+argmax kernel with an arbitrary src label vocabulary and a
    ``pollution_label`` fallback for blocs the catch-all wins. Unlike the
    mask classifier there is no implicit ±1e4 pollution box — the only
    catch-all is the ±1e5 plane that carries ``pollution_label``."""
    m = _match_src(blocs, src, threshold)
    label = F.when(F.col("s_matched"), F.col("s_label")).otherwise(
        F.lit(pollution_label).cast("string")
    )
    bloc_cols = [c for c in blocs.columns if c != "label"]
    return m.withColumn("label", label).select(*bloc_cols, "label")


def align_composite(
    blocs: DataFrame,
    src: DataFrame,
    threshold: float = 0.0001,
    pollution_label: Optional[str] = "pollution",
) -> DataFrame:
    """A4: composite label ``{label}|{node_num}|{rank}`` from the matched
    src box; unmatched → ``{pollution_label}|-1|-1`` (alignment.py:455-478).
    ``src`` must carry ``node_num`` and ``rank`` columns."""
    m = _match_src(blocs, src, threshold)

    def _pystr(c):
        # the reference formats with an f-string (alignment.py:427), so a
        # NULL field renders as the literal 'None' IN ITS SLOT — bare
        # concat_ws would silently SKIP the null and collapse the
        # 3-field composite to 2 fields, shifting every split('|') read
        return F.coalesce(c.cast("string"), F.lit("None"))

    label = F.when(
        F.col("s_matched"),
        F.concat_ws(
            "|",
            _pystr(F.col("s_label")),
            _pystr(F.col("s_node_num")),
            _pystr(F.col("s_rank")),
        ),
    ).otherwise(F.concat_ws("|", F.lit(pollution_label), F.lit(-1), F.lit(-1)))
    bloc_cols = [c for c in blocs.columns if c != "label"]
    return m.withColumn("label", label).select(*bloc_cols, "label")


def partition_lines(
    blocs: DataFrame,
    src: DataFrame,
    threshold: float = 0.0001,
    pollution_label: Optional[str] = "pollution",
) -> DataFrame:
    """A5: per matched src box, assemble the block text with label-dependent
    templates (lines_partition.py:88-107):

    * text/title/pollution → ``{label}@@:\\n`` + lines joined by space
    * table               → ``{label}:\\n`` + lines joined by space
    * list                → ``{label}:\\n`` + ``--> line`` joined by newline
    """
    m = _match_src(blocs, src, threshold)
    gid = F.when(F.col("s_matched"), F.col("s_ord")).otherwise(F.lit(-1))
    glabel = F.when(F.col("s_matched"), F.col("s_label")).otherwise(
        F.lit(pollution_label)
    )
    grouped = (
        m.withColumn("m_gid", gid)
        .withColumn("m_glabel", glabel)
        .groupBy("url", "page_num", "m_gid", "m_glabel")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("bloc_ord"), F.col("text")))
            ).alias("m_lines"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    texts = F.transform(F.col("m_lines"), lambda s: s["text"])
    block_text = (
        F.when(
            F.col("m_glabel").isin("text", "title", "pollution"),
            F.concat(F.col("m_glabel"), F.lit("@@:\n"), F.array_join(texts, " ")),
        )
        .when(
            F.col("m_glabel") == "table",
            F.concat(F.col("m_glabel"), F.lit(":\n"), F.array_join(texts, " ")),
        )
        .when(
            F.col("m_glabel") == "list",
            F.concat(
                F.col("m_glabel"),
                F.lit(":\n"),
                F.array_join(F.transform(texts, lambda t: F.concat(F.lit("--> "), t)), "\n"),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return grouped.select(
        "url",
        "page_num",
        F.col("m_gid").alias("src_ord"),
        F.col("m_glabel").alias("label"),
        "n_lines",
        block_text.alias("text"),
    )
