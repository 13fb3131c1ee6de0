"""Per-document text aggregation kernel.

Mirrors the reference ``SimpleAggregator.__call__``
(``edspdf/pipes/aggregators/simple.py:108-171``) exactly:

* ``row_height`` = MEAN height over ALL the document's text boxes, computed
  BEFORE dropping empty/unlabeled lines (simple.py:110);
* lines with empty text or NULL label are dropped (simple.py:111-113);
* optional sort by ``(label, page_num, y1 // row_height, x0)``
  (simple.py:114-118) — Python ``sorted`` (stable) on the same tuple;
* ``label_map`` maps NEW label → list of OLD labels; a line whose label maps
  to several new labels is duplicated into each group; new labels from the
  map are always emitted, even when empty (simple.py:123-135);
* per group: ``dy = next.y1 - cur.y1`` between consecutive lines of the same
  page (simple.py:139-144); ``height`` = ``np.median`` of line heights
  (simple.py:145); separator after each line = ``"\\n\\n"`` on page change or
  ``dy/height > new_paragraph_threshold``, ``"\\n"`` if ``>
  new_line_threshold``, else ``" "`` (simple.py:156-164);
* each style span is rebased by the length of the text accumulated so far
  BEFORE the line is appended (simple.py:147-153).

All arithmetic is float64; byte-identity of the output depends on it
(SURVEY.md §7.3).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

Line = Tuple[int, float, float, float, float, str, list, Optional[str]]
# (page_num, x0, y0, x1, y1, text, props, label) with props =
# list of (italic, bold, begin, end, fontname)


def _median_f64(vals: List[float]) -> float:
    """np.median for small finite float64 lists without the ~50µs ndarray
    overhead per call (measured 3% of the fused kernel); the even-n middle
    average ``(a + b) / 2.0`` is the same float64 op np.median performs."""
    for v in vals:
        if v != v:  # NaN → defer to np.median's partition semantics
            return float(np.median(np.asarray(vals, dtype=np.float64)))
    s = sorted(vals)
    mid = len(s) >> 1
    if len(s) & 1:
        return s[mid]
    return (s[mid - 1] + s[mid]) / 2.0


def aggregate_doc(
    lines: Sequence[Line],
    sort: bool = False,
    new_line_threshold: float = 0.2,
    new_paragraph_threshold: float = 1.5,
    label_map: Optional[Dict[str, Union[str, List[str]]]] = None,
) -> Dict[str, Tuple[str, list]]:
    """Aggregate one document's lines → {label: (text, rebased style runs)}.

    ``lines`` must arrive in document reading order (page_num asc, then the
    extractor's per-page fuzzy-sorted order) — the order of
    ``doc.content_boxes`` in the reference.
    """
    label_map = {
        label: [old] if not isinstance(old, list) else old
        for label, old in (label_map or {}).items()
    }

    all_lines = list(lines)
    n = max(1, len(all_lines))
    row_height = sum(b[4] - b[2] for b in all_lines) / n

    all_lines = [b for b in all_lines if len(b[5]) > 0 and b[7] is not None]
    if sort:
        all_lines = sorted(
            all_lines,
            key=lambda b: (b[7], b[0], b[4] // row_height, b[1]),
        )

    inv_label_map: Dict[str, list] = defaultdict(list)
    for new_label, old_labels in label_map.items():
        for old_label in old_labels:
            inv_label_map[old_label].append(new_label)

    lines_per_label: Dict[str, list] = defaultdict(list)
    lines_per_label.update({k: [] for k in label_map})
    for line in all_lines:
        for new_label in inv_label_map.get(line[7], [line[7]]):
            lines_per_label[new_label].append(line)

    out: Dict[str, Tuple[str, list]] = {}
    for label, group in lines_per_label.items():
        styles: list = []
        pairs = list(zip(group, [*group[1:], None]))
        dys = [
            nxt[4] - cur[4] if nxt is not None and cur[0] == nxt[0] else None
            for cur, nxt in pairs
        ]
        heights = [b[4] - b[2] for b in group]
        # median of an empty list is nan — harmless: an empty group loops
        # zero times, exactly like the reference (simple.py:145). Sorted
        # python median == np.median for finite float64 ((a+b)/2 middle
        # average); NaN heights fall back to np.median so the reference's
        # partition-order NaN behavior is preserved bit for bit.
        height = _median_f64(heights) if heights else float("nan")
        # text accumulates as parts + running length — per-line `text +=`
        # re-copies the whole prefix (O(n²) on long documents); the joined
        # result and the rebased span offsets are byte-identical
        parts: list = []
        tlen = 0
        for (cur, nxt), dy in zip(pairs, dys):
            for s in cur[6]:
                styles.append((s[0], s[1], s[2] + tlen, s[3] + tlen, s[4]))
            parts.append(cur[5])
            tlen += len(cur[5])
            if nxt is None:
                continue
            if cur[0] != nxt[0]:
                sep = "\n\n"
            else:
                if height != 0.0:
                    ratio = dy / height
                else:
                    # np.float64 semantics (the reference divides numpy
                    # scalars, simple.py:159-162): ±dy/0 → ±inf, 0/0 →
                    # nan — Python float division raises
                    # ZeroDivisionError instead, which would crash the
                    # task on a zero-height line group
                    ratio = (
                        float("inf")
                        if dy > 0
                        else (float("-inf") if dy < 0 else float("nan"))
                    )
                if ratio > new_paragraph_threshold:
                    sep = "\n\n"
                elif ratio > new_line_threshold:
                    sep = "\n"
                else:
                    sep = " "
            parts.append(sep)
            tlen += len(sep)
        out[label] = ("".join(parts), styles)
    return out
