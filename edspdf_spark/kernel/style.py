"""Char-stream → (text, style runs) fold.

Mirrors the reference ``extract_properties_from_line``
(``edspdf/pipes/extractors/pdfminer.py:197-249``) over an abstract char
stream. Semantics replicated exactly:

* every whitespace char collapses to a single space (``re.sub(r"\\s", " ")``)
* a space is dropped when the text is empty or already ends with a space
  (no leading / double spaces)
* a space *inherits* the style of the previous char (or ``(None, None,
  None)`` at line start — which opens a zero-width ``fontname=None`` run,
  faithfully reproducing the reference's behavior for leading whitespace)
* a style run ``[begin, end)`` is opened whenever ``(fontname, italic,
  bold)`` changes; its ``end`` is only advanced by non-space chars, so
  trailing spaces never extend a run
* the final text is right-stripped.

Style derivation: the reference computes ``italic = not char.upright or
"italic" in char.fontname.lower()`` and ``bold = "bold" in
char.fontname.lower()`` (pdfminer.py:225-227). Our char stream carries
``(char, fontname, upright)`` where ``upright=False`` stands in for
pdfminer's rotated-glyph flag.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Tuple

_WS = re.compile(r"\s")

StyleRun = Tuple[Optional[bool], Optional[bool], int, int, Optional[str]]
# (italic, bold, begin, end, fontname) — field order matches PROPS_FIELD.

# (fontname, upright) → (italic, bold): fonts repeat across millions of
# lines, the two substring scans per char/run were ~10% of the fused
# kernel. Bounded so a pathological corpus can't grow it unboundedly.
_FONT_STYLE_CACHE: dict = {}


def _font_style(fontname: Optional[str], upright: bool) -> Tuple[bool, bool]:
    key = (fontname, upright)
    st = _FONT_STYLE_CACHE.get(key)
    if st is None:
        lowered = (fontname or "").lower()
        st = ((not upright) or ("italic" in lowered), "bold" in lowered)
        if len(_FONT_STYLE_CACHE) < 4096:
            _FONT_STYLE_CACHE[key] = st
    return st


def fold_line_chars(
    chars: Iterable[Tuple[str, str, bool]],
) -> Tuple[str, List[StyleRun]]:
    """Fold ``(char, fontname, upright)`` triples into (text, style runs).

    Text accumulates as a parts list + running length (string
    concatenation per char re-copies the prefix — O(n²) on long lines);
    begin/end arithmetic is unchanged from the reference semantics.
    """
    styles: List[list] = []
    current: Optional[list] = None  # [italic, bold, begin, end, fontname]
    parts: List[str] = []
    tlen = 0
    last_char = ""
    last: Optional[Tuple[Optional[str], Optional[bool], Optional[bool]]] = None

    for raw, fontname_in, upright in chars:
        new_char = " " if _WS.match(raw) else raw
        skip = new_char == " " and (last_char == " " or tlen == 0)
        new_len = tlen if skip else tlen + 1

        if new_char == " ":
            if last is not None:
                fontname, italic, bold = last[0], last[1], last[2]
            else:
                fontname, italic, bold = (None, None, None)
        else:
            fontname = fontname_in
            italic, bold = _font_style(fontname_in, upright)

        if (fontname, italic, bold) != last:
            if current is not None:
                styles.append(current)
            current = [italic, bold, tlen, new_len, fontname]
        elif new_char != " ":
            current[3] = new_len
        if not skip:
            parts.append(new_char)
            tlen = new_len
            last_char = new_char
        last = (fontname, italic, bold)

    if current is not None:
        styles.append(current)

    return "".join(parts).rstrip(), [tuple(s) for s in styles]


# A line needs the char-by-char fold only if it contains non-space
# whitespace, a double space, or a leading/trailing space. Everything else
# (the overwhelming majority of real lines) folds to itself with one style
# run per input run boundary.
_NEEDS_FOLD = re.compile(r"[^\S ]|  |^ | $")


def fold_runs(
    runs: Iterable[Tuple[str, bool, str]],
) -> Tuple[str, List[StyleRun]]:
    """Fold ``(fontname, upright, text)`` runs into (text, style runs).

    Fast path: a single clean run (no collapsible whitespace, no edge
    spaces) is its own folded text with exactly one ``[0, len)`` span —
    identical to the full fold's output, without materializing a tuple per
    character. Multi-run or dirty lines fall back to
    :func:`fold_line_chars` for the exact reference semantics
    (equivalence is asserted by tests/test_kernel.py).
    """
    runs = list(runs)
    if len(runs) == 1:
        # dominant case — avoid the generic all() scan
        fontname, upright, t = runs[0]
        if t and not _NEEDS_FOLD.search(t):
            italic, bold = _font_style(fontname, upright)
            return t, [(italic, bold, 0, len(t), fontname)]
        chars = [(ch, fontname, upright) for ch in t]
        return fold_line_chars(chars)
    if runs and all(t and not _NEEDS_FOLD.search(t) for _, _, t in runs):
        # Every run is clean, so no whitespace collapses and no space
        # crosses a run boundary (clean runs neither start nor end with
        # one): the folded text is the plain concatenation and spans open
        # exactly at style changes — same-style adjacent runs merge, as the
        # char fold would.
        text_parts: List[str] = []
        styles: List[StyleRun] = []
        pos = 0
        last = None
        for fontname, upright, t in runs:
            italic, bold = _font_style(fontname, upright)
            key = (fontname, italic, bold)
            end = pos + len(t)
            if key == last:
                prev = styles[-1]
                styles[-1] = (prev[0], prev[1], prev[2], end, prev[4])
            else:
                styles.append((italic, bold, pos, end, fontname))
            text_parts.append(t)
            pos = end
            last = key
        return "".join(text_parts), styles
    chars = [
        (ch, fontname, upright) for fontname, upright, text in runs for ch in text
    ]
    return fold_line_chars(chars)
