"""Deterministic synthetic layout-payload format + document extraction kernel.

pdfminer is not installable in this sandbox (SURVEY.md §5), so the engine
parses a self-describing, line-oriented layout format (FIXTURES.md §1) that
stands in for PDF bytes while exercising every extractor semantic of the
reference (``edspdf/pipes/extractors/pdfminer.py:117-194``):

* coordinate normalization ``x/w`` and the y-flip ``y0 = 1 - y1/h``
  (pdfminer.py:167-170) — payload coordinates are absolute with origin
  BOTTOM-left, like PDF;
* empty lines skipped after the style fold (pdfminer.py:161-162);
* out-of-bounds boxes dropped after normalization (pdfminer.py:178-182);
* per-page reading-order sort via the fuzzy comparator
  (pdfminer.py:176-184, structures.py:189-226);
* parse failure → ``error=True`` and zero boxes (pdfminer.py:130-135).

Format (UTF-8 text)::

    PAGE <page_num> <width> <height>
    LINE <x0> <y0> <x1> <y1> <run>[|<run>...]      # absolute page coords
      run := <fontname>,<upright:0|1>,<text-urlencoded>
    CORRUPT                                        # anywhere: doc is corrupt
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple
from urllib.parse import quote, unquote

from edspdf_spark.kernel.pdf import PdfParseError, is_pdf, parse_pdf
from edspdf_spark.kernel.reading_order import sort_reading_order
from edspdf_spark.kernel.style import fold_runs


class PayloadError(ValueError):
    """Raised when a payload cannot be parsed (≙ pdfminer PDFException)."""


def encode_run(fontname: str, upright: bool, text: str) -> str:
    return f"{fontname},{1 if upright else 0},{quote(text)}"


def _unquote_fast(s: str) -> str:
    """``urllib.parse.unquote`` with a shortcut for the dominant case:
    strings whose only escape is ``%20`` (word text with spaces). Any other
    percent-escape falls back to the full decoder on the ORIGINAL string,
    so the result is always identical to ``unquote(s)``."""
    if "%" not in s:
        return s
    out = s.replace("%20", " ")
    if "%" in out:
        return unquote(s)
    return out


def parse_payload(data: bytes):
    """Parse payload bytes → (pages, lines).

    pages : list of (page_num, width, height)
    lines : list of (page_num, x0, y0, x1, y1, runs) with
            runs = list of (fontname, upright, text)

    Raises PayloadError on any malformed content (the extractor catches it
    and emits the error sentinel, like the reference's ``raise_on_error``
    handling).
    """
    try:
        content = data.decode("utf-8")
    except Exception as exc:  # undecodable bytes == corrupt document
        raise PayloadError("undecodable payload") from exc

    pages: List[Tuple[int, float, float]] = []
    lines: List[Tuple[int, float, float, float, float, list]] = []
    current_page: Optional[int] = None
    seen_pages: set = set()

    # hot loop: LINE rows dominate every real payload — dispatch on the
    # prefix without tokenizing twice, call float() positionally (a
    # genexpr here was ~12% of parse time)
    try:
        for raw_line in content.split("\n"):
            stripped = raw_line.strip()
            if not stripped:
                continue
            if stripped.startswith("LINE "):
                if current_page is None:
                    raise PayloadError("LINE before PAGE")
                parts = stripped.split(" ", 5)
                if len(parts) != 6:
                    raise PayloadError(f"bad LINE line: {stripped!r}")
                runs = []
                for run in parts[5].split("|"):
                    fields = run.split(",", 2)
                    if len(fields) != 3:
                        raise PayloadError(f"bad run: {run!r}")
                    runs.append((fields[0], fields[1] == "1", _unquote_fast(fields[2])))
                lines.append(
                    (
                        current_page,
                        float(parts[1]),
                        float(parts[2]),
                        float(parts[3]),
                        float(parts[4]),
                        runs,
                    )
                )
            elif stripped.startswith("PAGE "):
                parts = stripped.split()
                if len(parts) != 4:
                    raise PayloadError(f"bad PAGE line: {stripped!r}")
                page_num = int(parts[1])
                if page_num in seen_pages:
                    # a re-declared page would double-emit its blocs with
                    # duplicate (page_num, bloc_ord) keys downstream
                    raise PayloadError(f"duplicate PAGE {page_num}")
                seen_pages.add(page_num)
                pages.append((page_num, float(parts[2]), float(parts[3])))
                current_page = page_num
            elif stripped.split(" ", 1)[0] == "CORRUPT":
                raise PayloadError("corrupt marker")
            else:
                raise PayloadError(
                    f"unknown directive: {stripped.split(' ', 1)[0]!r}"
                )
    except PayloadError:
        raise
    except ValueError as exc:
        # float()/int() on malformed numerics — a bare ValueError is NOT
        # a PayloadError subclass and would escape the extractor's
        # poison-pill catch, crashing the task instead of flagging the doc
        raise PayloadError(f"malformed number in payload: {exc}") from exc

    return pages, lines


def extract_doc_raw(
    html: Optional[bytes],
) -> Tuple[List[tuple], List[Tuple[int, float, float]], bool]:
    """Extract one document → (bloc TUPLES, pages, error) — the
    allocation-light kernel the fused production path consumes directly.

    Bloc tuple: ``(page_num, bloc_ord, x0, y0, x1, y1, text, props)`` with
    ``props`` a list of ``(italic, bold, begin, end, fontname)`` StyleRuns
    exactly as :func:`fold_runs` emits them.
    """
    if html is None:
        return [], [], True
    try:
        raw_bytes = bytes(html)
        if is_pdf(raw_bytes):
            # real PDF bytes (reference test fixtures & any %PDF- payload):
            # the pure-Python parser emits the same (pages, lines) shape,
            # so normalization / bounds filter / reading order below are
            # shared with the synthetic-payload path.
            pages, lines = parse_pdf(raw_bytes)
        else:
            pages, lines = parse_payload(raw_bytes)
    except (PayloadError, PdfParseError):
        return [], [], True

    by_page: Dict[int, list] = {p[0]: [] for p in pages}
    page_dims = {p[0]: (p[1], p[2]) for p in pages}
    for page_num, x0, y0, x1, y1, runs in lines:
        if page_num not in page_dims:
            return [], [], True
        by_page[page_num].append((x0, y0, x1, y1, runs))

    blocs: List[tuple] = []
    # Reference iterates pages in layout order and, per page, filters
    # out-of-bounds boxes then sorts by the fuzzy comparator
    # (pdfminer.py:140-184).
    for page_num, _w, _h in pages:
        w, h = page_dims[page_num]
        if not (w > 0 and h > 0):
            # degenerate page geometry: x/w normalization would raise
            # ZeroDivisionError past the poison-pill catch — the whole
            # doc is flagged, matching the reference's parse-error path
            return [], [], True
        in_bounds = []
        for x0, y0, x1, y1, runs in by_page[page_num]:
            text, props = fold_runs(runs)
            if len(text) == 0:
                continue
            nx0 = x0 / w
            nx1 = x1 / w
            ny0 = 1 - y1 / h
            ny1 = 1 - y0 / h
            # bounds filter inline (pdfminer.py:178-182) — one pass, no
            # intermediate page_boxes list
            if nx0 >= 0 and ny0 >= 0 and nx1 <= 1 and ny1 <= 1:
                in_bounds.append((page_num, nx0, ny0, nx1, ny1, text, props))

        for ord_, b in enumerate(sort_reading_order(in_bounds)):
            blocs.append((b[0], ord_, b[1], b[2], b[3], b[4], b[5], b[6]))
    return blocs, pages, False


def extract_doc(
    html: Optional[bytes],
    extract_style: bool = True,
) -> Tuple[List[dict], List[Tuple[int, float, float]], bool]:
    """Extract one document → (bloc dicts, pages, error).

    Bloc dicts carry normalized float64 coords, reading-order ``bloc_ord``
    per page, folded text and style runs — the relational image of the
    reference's ``doc.content_boxes`` after ``PdfMinerExtractor.__call__``.
    Thin dict view over :func:`extract_doc_raw` (the fused path skips the
    dict materialization entirely).
    """
    raw, pages, error = extract_doc_raw(html)
    blocs = [
        {
            "page_num": b[0],
            "bloc_ord": b[1],
            "x0": b[2],
            "y0": b[3],
            "x1": b[4],
            "y1": b[5],
            "text": b[6],
            "props": [
                {
                    "italic": s[0],
                    "bold": s[1],
                    "begin": s[2],
                    "end": s[3],
                    "fontname": s[4],
                }
                for s in b[7]
            ]
            if extract_style
            else [],
        }
        for b in raw
    ]
    return blocs, pages, error
