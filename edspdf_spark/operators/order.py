"""P10/P11 — pairwise reading-order scorer skeleton.

The reference's ``order-ba`` / ``order-num`` trainable classifiers score
every line pair (i, j) per page with ``einsum(fc_i(e_i), fc_j(e_j)) +
MLP(Δgeometry)`` where Δgeometry is an 18-value vector
(``/root/reference/edspdf/pipes/classifiers/trainable_order_ba.py:165-221``):
``delta(b_i, b_j) + delta(b_i, union(b_i,b_j)) + delta(b_j, union(b_i,b_j))``,
each ``delta`` = ``[d_x_ctr, d_y_ctr, log(w_a/w_b), log(h_a/h_b),
rev_x_ctr, rev_y_ctr]``.

The deep model is out of relational scope (SURVEY §7.3 — the reading-order
CONTRACT is covered deterministically by the ``Box.__lt__`` sort in P1);
this module claims the relational half: the pairwise feature generation as
a pure DataFrame plan — a self-join on (url, page_num) plus 18 codegen'd
column expressions, no UDF — with a pluggable ``scorer`` hook where a
broadcast model (Pandas UDF) would slot in.

Faithfulness notes (semantics mirrored verbatim, quirks included):

* the reference's ``union_bounding_box`` takes ``min`` for x1/y1 — NOT a
  true union (``trainable_order_ba.py:197-204``); reproduced as-is since
  it is what the trained model consumes;
* ``delta``'s "centre" terms are half-extents ``(x1-x0)/2``, not midpoints
  (``:206-219``); reproduced as-is.

At 10^12 docs the join key (url, page_num) keeps the O(lines²) blowup
strictly per-page (~40 lines → ~1.6k pairs), and the equi-join shuffles
both sides by the same key — one shuffle, co-partitioned.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delta(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> list:
    """Reference ``delta(bi, bj)`` (trainable_order_ba.py:206-219)."""
    a_xc = (ax1 - ax0) / F.lit(2.0)
    a_yc = (ay1 - ay0) / F.lit(2.0)
    aw = ax1 - ax0
    ah = ay1 - ay0
    b_xc = (bx1 - bx0) / F.lit(2.0)
    b_yc = (by1 - by0) / F.lit(2.0)
    bw = bx1 - bx0
    bh = by1 - by0
    return [
        (a_xc - b_xc) / aw,
        (a_yc - b_yc) / ah,
        F.log(aw / bw),
        F.log(ah / bh),
        (b_xc - a_xc) / bw,
        (b_yc - a_yc) / bh,
    ]


#: Column names of the 18 pairwise features, in reference order
#: (r_bi_bj = delta(i,j) + delta(i,union) + delta(j,union)).
ORDER_FEATURE_COLS = [
    f"{pair}_{part}"
    for pair in ("dij", "diu", "dju")
    for part in ("x_ctr", "y_ctr", "log_w", "log_h", "rev_x_ctr", "rev_y_ctr")
]


def pairwise_order_features(
    blocs: DataFrame,
    scorer: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> DataFrame:
    """All ordered line pairs (i, j), i ≠ j, per (url, page) with the 18
    reference geometry features as columns. ``scorer`` (optional) maps the
    feature DataFrame to one with a ``score`` column — the slot where the
    reference's pairwise model would run as a broadcast Pandas UDF."""
    cols = ["url", "page_num", "bloc_ord", "x0", "y0", "x1", "y1"]
    base = blocs.filter(~F.col("error")).select(*cols)
    i = base.select(
        "url", "page_num", F.col("bloc_ord").alias("ord_i"),
        F.col("x0").alias("ix0"), F.col("y0").alias("iy0"),
        F.col("x1").alias("ix1"), F.col("y1").alias("iy1"),
    )
    j = base.select(
        "url", "page_num", F.col("bloc_ord").alias("ord_j"),
        F.col("x0").alias("jx0"), F.col("y0").alias("jy0"),
        F.col("x1").alias("jx1"), F.col("y1").alias("jy1"),
    )
    pairs = i.join(j, on=["url", "page_num"]).filter(F.col("ord_i") != F.col("ord_j"))

    ix0, iy0, ix1, iy1 = F.col("ix0"), F.col("iy0"), F.col("ix1"), F.col("iy1")
    jx0, jy0, jx1, jy1 = F.col("jx0"), F.col("jy0"), F.col("jx1"), F.col("jy1")
    # reference union_bounding_box — x1/y1 via min, verbatim (:197-204)
    ux0 = F.least(ix0, jx0)
    uy0 = F.least(iy0, jy0)
    ux1 = F.least(ix1, jx1)
    uy1 = F.least(iy1, jy1)

    feats = (
        _delta(ix0, iy0, ix1, iy1, jx0, jy0, jx1, jy1)
        + _delta(ix0, iy0, ix1, iy1, ux0, uy0, ux1, uy1)
        + _delta(jx0, jy0, jx1, jy1, ux0, uy0, ux1, uy1)
    )
    out = pairs.select(
        "url",
        "page_num",
        "ord_i",
        "ord_j",
        *[c.alias(name) for c, name in zip(feats, ORDER_FEATURE_COLS)],
    )
    return scorer(out) if scorer is not None else out
