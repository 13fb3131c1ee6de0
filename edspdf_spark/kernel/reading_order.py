"""Fuzzy 2-D reading-order comparator.

Mirrors the reference ``Box.__lt__`` (``edspdf/structures.py:189-226``):
boxes are shrunk by alpha=0.2 toward their center, vertical separation is
tested first, then horizontal, with a final (y-center, x-center) tie-break.

The comparator is NOT transitive, so it cannot be turned into a sort *key*
(and therefore not into a Spark ``orderBy``). The reference sorts each page's
line list with Python ``sorted()`` (Timsort driven purely by ``<``,
``pipes/extractors/pdfminer.py:176-184``); we do exactly the same on the tiny
per-page list (tens of lines) inside the extract UDF — byte-identity of the
downstream aggregated text depends on replicating this order exactly
(SURVEY.md §7.3).
"""

from __future__ import annotations

from functools import cmp_to_key
from typing import Sequence

import numpy as np

_ALPHA = 0.2
_BETA = 1.0 - _ALPHA


def reading_order_lt(a, b) -> bool:
    """``a < b`` in reading order; a and b expose x0/x1/y0/y1/page_num."""
    a_page = a[0] or 0
    b_page = b[0] or 0
    if a_page < b_page:
        return True
    if a_page > b_page:
        return False

    a_x0 = a[1] * _BETA + a[3] * _ALPHA
    a_x1 = a[1] * _ALPHA + a[3] * _BETA
    a_y0 = a[2] * _BETA + a[4] * _ALPHA
    a_y1 = a[2] * _ALPHA + a[4] * _BETA

    b_x0 = b[1] * _BETA + b[3] * _ALPHA
    b_x1 = b[1] * _ALPHA + b[3] * _BETA
    b_y0 = b[2] * _BETA + b[4] * _ALPHA
    b_y1 = b[2] * _ALPHA + b[4] * _BETA

    dy0 = b_y1 - a_y0
    dy1 = b_y0 - a_y1
    if dy0 > 0 and dy1 > 0:
        return True
    if dy0 < 0 and dy1 < 0:
        return False

    dx0 = b_x1 - a_x0
    dx1 = b_x0 - a_x1
    if dx0 > 0 and dx1 > 0:
        return True
    if dx0 < 0 and dx1 < 0:
        return False

    return ((a[2] + a[4]) / 2, (a[1] + a[3]) / 2) < ((b[2] + b[4]) / 2, (b[1] + b[3]) / 2)


def _cmp(a, b) -> int:
    # Timsort only ever asks "a < b"; cmp_to_key maps K(a) < K(b) to
    # cmp(a, b) < 0, so returning -1 iff lt(a, b) reproduces sorted(boxes)
    # over __lt__ exactly (including its handling of the non-transitive
    # comparator).
    return -1 if reading_order_lt(a, b) else 1


_READING_ORDER_KEY = cmp_to_key(_cmp)


def sort_reading_order(boxes: Sequence) -> list:
    """Stable-sort boxes — tuples ``(page_num, x0, y0, x1, y1, *payload)`` —
    exactly as the reference sorts a page's line list.

    Fast path: when every pair of (shrunk) boxes on the page is STRICTLY
    vertically separated, the comparator is a strict total order identical
    to ascending shrunk-y0 — adjacency of the sorted intervals implies
    separation of all pairs, so one argsort plus one adjacent check
    replaces the O(n log n) Python comparator calls. Pages with
    side-by-side text (overlapping y bands) fall back to the exact
    Timsort-over-__lt__ replication."""
    n = len(boxes)
    if n > 2:
        same_page = all(b[0] == boxes[0][0] for b in boxes)
        if same_page:
            ys = np.array([[b[2], b[4]] for b in boxes], dtype=np.float64)
            # the adjacency check implies all-pairs separation only when
            # every box is upright (y1 >= y0 → shrunk ys0 <= ys1); an
            # inverted box must fall back to the exact comparator path
            if np.all(ys[:, 1] >= ys[:, 0]):
                ys0 = ys[:, 0] * _BETA + ys[:, 1] * _ALPHA
                ys1 = ys[:, 0] * _ALPHA + ys[:, 1] * _BETA
                order = np.argsort(ys0, kind="stable")
                if np.all(ys1[order][:-1] < ys0[order][1:]):
                    return [boxes[i] for i in order]
    return sorted(boxes, key=_READING_ORDER_KEY)
