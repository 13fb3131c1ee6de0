"""Deterministic PDF writer — real ``%PDF-`` bytes for the byte-ingestion path.

Builds small but genuine PDFs (FlateDecode content streams, Type0 /
Identity-H font with a ToUnicode CMap, multi-page /Pages tree) so the
engine's pure-Python PDF parser (:mod:`edspdf_spark.kernel.pdf`) is
exercised end-to-end from the driver's ``documents`` table without any
external fixture. Geometry is chosen so every downstream semantic of the
reference pipeline is deterministic and SQL-predictable:

* one text-show per line at ``x=30``, ``y = 760 - 6*i`` with font size 5
  → bloc height exactly ``5/792`` and inter-line ``dy = 6/792``, so the
  aggregator's ``dy/median_height = 1.2`` lands strictly between the
  new-line (0.2) and new-paragraph (1.5) thresholds
  (``edspdf/pipes/aggregators/simple.py:156-164``) → lines join with
  ``"\\n"`` inside a page and ``"\\n\\n"`` across pages;
* lines are vertically disjoint and in reading order already, so the
  fuzzy sort is the identity;
* ``x1 = 30 + 2.5·len(line) ≤ 612`` for any line ≤ 232 chars → nothing
  is dropped by the bounds filter.
"""

from __future__ import annotations

import zlib
from typing import Iterator, List

__all__ = ["make_pdf", "split_lines", "paginate", "documents_to_pdfs"]

PAGE_W = 612.0
PAGE_H = 792.0
FONT_SIZE = 5.0
LINE_X = 30.0
LINE_Y0 = 760.0
LINE_DY = 6.0
CHAR_W = 500  # /DW glyph units → 0.5 em = 2.5pt at size 5

_TO_UNICODE = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0000> <FFFF> <0000>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


def split_lines(text: str, words_per_line: int = 8) -> List[str]:
    """Whitespace-normalize and chunk into fixed-size word groups."""
    words = text.split()
    return [
        " ".join(words[i : i + words_per_line])
        for i in range(0, len(words), words_per_line)
    ]


def paginate(lines: List[str], lines_per_page: int = 5) -> List[List[str]]:
    return [lines[i : i + lines_per_page] for i in range(0, len(lines), lines_per_page)]


def _hex_utf16be(s: str) -> bytes:
    return s.encode("utf-16-be").hex().upper().encode("ascii")


def make_pdf(pages: List[List[str]]) -> bytes:
    """Render pages (lists of line strings) into real PDF bytes.

    Only BMP characters are representable (Identity-H, one UTF-16 code
    unit per CID); callers should pre-sanitize anything else.
    """
    objects: List[bytes] = []  # 1-indexed object bodies (without obj/endobj)

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    n_pages = max(1, len(pages))
    if not pages:
        pages = [[]]

    # font objects
    tou_stream = zlib.compress(_TO_UNICODE)
    tou_num = add(
        b"<</Filter/FlateDecode/Length %d>>\nstream\n%s\nendstream"
        % (len(tou_stream), tou_stream)
    )
    descr_num = add(
        b"<</Type/FontDescriptor/FontName/SparkGraftMono/Flags 4"
        b"/FontBBox[0 -200 500 800]/ItalicAngle 0/Ascent 800/Descent -200"
        b"/CapHeight 700/StemV 80>>"
    )
    cid_num = add(
        b"<</Type/Font/Subtype/CIDFontType2/BaseFont/SparkGraftMono"
        b"/CIDSystemInfo<</Registry(Adobe)/Ordering(Identity)/Supplement 0>>"
        b"/FontDescriptor %d 0 R/DW %d/CIDToGIDMap/Identity>>" % (descr_num, CHAR_W)
    )
    font_num = add(
        b"<</Type/Font/Subtype/Type0/BaseFont/SparkGraftMono/Encoding/Identity-H"
        b"/DescendantFonts[%d 0 R]/ToUnicode %d 0 R>>" % (cid_num, tou_num)
    )

    # content + page objects (pages tree object number reserved after)
    content_nums: List[int] = []
    for page_lines in pages:
        ops = [b"BT /F1 %g Tf" % FONT_SIZE]
        for i, line in enumerate(page_lines):
            y = LINE_Y0 - LINE_DY * i
            ops.append(b"1 0 0 1 %g %g Tm <%s> Tj" % (LINE_X, y, _hex_utf16be(line)))
        ops.append(b"ET")
        raw = b"\n".join(ops)
        comp = zlib.compress(raw)
        content_nums.append(
            add(
                b"<</Filter/FlateDecode/Length %d>>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
        )

    pages_num = len(objects) + n_pages + 1  # page objs next, then tree
    page_nums = []
    for cnum in content_nums:
        page_nums.append(
            add(
                b"<</Type/Page/Parent %d 0 R/MediaBox[0 0 %g %g]"
                b"/Resources<</Font<</F1 %d 0 R>>>>/Contents %d 0 R>>"
                % (pages_num, PAGE_W, PAGE_H, font_num, cnum)
            )
        )
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    assert add(
        b"<</Type/Pages/Kids[%s]/Count %d>>" % (kids, n_pages)
    ) == pages_num
    catalog_num = add(b"<</Type/Catalog/Pages %d 0 R>>" % pages_num)

    # serialize with a classic xref table
    out = bytearray(b"%PDF-1.5\n%\xc3\xa4\xc3\xbc\xc3\xb6\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<</Size %d/Root %d 0 R>>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objects) + 1,
        catalog_num,
        xref_pos,
    )
    return bytes(out)


def documents_to_pdfs(
    df,
    words_per_line: int = 8,
    lines_per_page: int = 5,
):
    """``documents(doc_id, text, …)`` → ``pages(url, html binary)`` where
    ``html`` is real PDF bytes rendering the doc's text.

    Arrow-batched ``mapInPandas`` — the writer is pure per-row Python but
    runs distributed; it is a *test-data producer*, not a benched operator.
    """
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("html", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_batch in batches:
            urls = []
            blobs = []
            for doc_id, text in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                lines = split_lines(str(text), words_per_line)
                urls.append(f"doc://{int(doc_id)}")
                blobs.append(make_pdf(paginate(lines, lines_per_page)))
            yield pd.DataFrame({"url": urls, "html": blobs})

    return df.select("doc_id", "text").mapInPandas(gen, schema)
