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


def fold_line_chars(
    chars: Iterable[Tuple[str, str, bool]],
) -> Tuple[str, List[StyleRun]]:
    """Fold ``(char, fontname, upright)`` triples into (text, style runs)."""
    styles: List[list] = []
    current: Optional[list] = None  # [italic, bold, begin, end, fontname]
    text = ""
    last: Optional[Tuple[Optional[str], Optional[bool], Optional[bool]]] = None

    for raw, fontname_in, upright in chars:
        new_char = _WS.sub(" ", raw)
        if not (new_char == " " and (text.endswith(" ") or text == "")):
            new_text = text + new_char
        else:
            new_text = text

        if new_char == " ":
            if last is not None:
                fontname, italic, bold = last[0], last[1], last[2]
            else:
                fontname, italic, bold = (None, None, None)
        else:
            fontname = fontname_in
            lowered = (fontname_in or "").lower()
            italic = (not upright) or ("italic" in lowered)
            bold = "bold" in lowered

        if (fontname, italic, bold) != last:
            if current is not None:
                styles.append(current)
            current = [italic, bold, len(text), len(new_text), fontname]
        elif new_char != " ":
            current[3] = len(new_text)
        text = new_text
        last = (fontname, italic, bold)

    if current is not None:
        styles.append(current)

    return text.rstrip(), [tuple(s) for s in styles]
