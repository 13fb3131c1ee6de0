"""A2 BIOUL / A4 composite / A5 partition-to-text / A6 merge — semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edspdf_spark.schemas import BLOC_SCHEMA

SRC_SCHEMA = (
    "url string, page_num int, x0 double, y0 double, x1 double, y1 double,"
    " label string, src_ord int, node_num int, rank int"
)


@pytest.fixture()
def doc_blocs(spark):
    # two tight columns of lines: top box holds 2 lines, bottom box 1 line,
    # one stray line overlapping nothing
    rows = [
        ("d", 0, 0, 0.10, 0.10, 0.90, 0.15, "l0", [], None, False),
        ("d", 0, 1, 0.10, 0.16, 0.90, 0.21, "l1", [], None, False),
        ("d", 0, 2, 0.10, 0.60, 0.90, 0.65, "l2", [], None, False),
        ("d", 0, 3, 0.10, 0.90, 0.90, 0.95, "l3", [], None, False),
    ]
    return spark.createDataFrame(rows, BLOC_SCHEMA)


@pytest.fixture()
def doc_src(spark):
    rows = [
        ("d", 0, 0.0, 0.05, 1.0, 0.25, "text", 0, 7, 1),
        ("d", 0, 0.0, 0.55, 1.0, 0.70, "title", 1, 8, 2),
    ]
    return spark.createDataFrame(rows, SRC_SCHEMA)


def test_align_bioul(spark, doc_blocs, doc_src):
    from edspdf_spark.operators.align import align_bioul

    out = align_bioul(doc_blocs, doc_src, threshold=0.5)
    tags = {r.bloc_ord: (r.label, r.is_begin, r.is_last) for r in out.collect()}
    assert tags[0] == ("B", True, False)
    assert tags[1] == ("L", False, True)
    assert tags[2] == ("U", True, True)
    assert tags[3] == ("U", True, True)  # alone in the pollution group


def test_align_composite(spark, doc_blocs, doc_src):
    from edspdf_spark.operators.align import align_composite

    out = align_composite(doc_blocs, doc_src, threshold=0.5)
    labels = {r.bloc_ord: r.label for r in out.collect()}
    assert labels[0] == "text|7|1"
    assert labels[2] == "title|8|2"
    assert labels[3] == "pollution|-1|-1"


def test_partition_lines_templates(spark, doc_blocs, doc_src):
    from edspdf_spark.operators.align import partition_lines

    # relabel srcs to exercise the templates
    src = doc_src.withColumn(
        "label", F.when(F.col("src_ord") == 0, "table").otherwise("list")
    )
    out = {r.label: r.text for r in partition_lines(doc_blocs, src, 0.5).collect()}
    assert out["table"] == "table:\nl0 l1"
    assert out["list"] == "list:\n--> l2"
    assert out["pollution"] == "pollution@@:\nl3"


def test_partition_lines_text_template(spark, doc_blocs, doc_src):
    from edspdf_spark.operators.align import partition_lines

    out = {r.label: r.text for r in partition_lines(doc_blocs, doc_src, 0.5).collect()}
    assert out["text"] == "text@@:\nl0 l1"
    assert out["title"] == "title@@:\nl2"


def test_no_src_drops_page(spark, doc_blocs, spark_session=None):
    from edspdf_spark.operators.align import align_bioul

    empty_src = doc_blocs.sparkSession.createDataFrame([], SRC_SCHEMA)
    assert align_bioul(doc_blocs, empty_src, 0.5).count() == 0


def test_merge_boxes_simple(spark):
    from edspdf_spark.operators.merge import merge_boxes

    # two 'a' boxes mergeable (nothing between); a 'b' box between two other
    # 'a' boxes prevents their merger
    rows = [
        ("d", 0, 0, 0.1, 0.1, 0.2, 0.2, "", [], "a", False),
        ("d", 0, 1, 0.3, 0.1, 0.4, 0.2, "", [], "a", False),
        ("d", 0, 2, 0.1, 0.5, 0.2, 0.6, "", [], "a", False),
        ("d", 0, 3, 0.3, 0.7, 0.4, 0.8, "", [], "a", False),
        ("d", 0, 4, 0.25, 0.55, 0.45, 0.62, "", [], "b", False),
    ]
    blocs = spark.createDataFrame(rows, BLOC_SCHEMA)
    out = merge_boxes(blocs).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r)
    # the b box survives as itself
    assert len(by_label["b"]) == 1
    # the two top 'a' boxes merge; the bottom ones can't merge across 'b'
    a_groups = sorted(by_label["a"], key=lambda r: (r.y0, r.x0))
    assert any(r.n_merged >= 2 for r in by_label["a"])
    total_merged = sum(r.n_merged for r in by_label["a"])
    assert total_merged == 4


def test_merge_kernel_no_obstacle_single_group():
    import numpy as np

    from edspdf_spark.operators.merge import merge_boxes_kernel

    labels = np.array(["x", "x", "x"], dtype=object)
    coords = np.array(
        [[0.0, 0.1, 0.0, 0.1], [0.2, 0.3, 0.0, 0.1], [0.0, 0.3, 0.2, 0.3]]
    )
    out = merge_boxes_kernel(labels, coords)
    assert len(out) == 1
    label, x0, y0, x1, y1, n = out[0]
    assert (x0, y0, x1, y1, n) == (0.0, 0.0, 0.3, 0.3, 3)


def test_html_extractor(spark):
    from edspdf_spark.operators.extract_html import extract_blocs_html

    html = b"""<html><head><title>T</title><style>.x{color:red}</style>
    <script>var x = '<p>not content</p>';</script></head>
    <body><nav><a href="/">Home</a> <a href="/a">About</a></nav>
    <article><h1>Real Title Here</h1>
    <p>This is the first real paragraph of the main content body.</p>
    <p>Second paragraph with more than three words obviously.</p></article>
    <footer><a href="/c">Contact</a> <a href="/p">Privacy</a></footer>
    </body></html>"""
    pages = spark.createDataFrame(
        [("u", None, bytearray(html), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_blocs_html(pages).collect()
    body = [r.text for r in out if r.label == "body"]
    boiler = [r.text for r in out if r.label == "boilerplate"]
    assert any("first real paragraph" in t for t in body)
    assert any("Second paragraph" in t for t in body)
    assert not any("Home" in t for t in body)  # nav stripped
    assert not any("not content" in t for t in body)  # script stripped
    assert any("Home" in t or "Contact" in t for t in boiler)


def test_html_extractor_corrupt(spark):
    from edspdf_spark.operators.extract_html import extract_blocs_html

    pages = spark.createDataFrame(
        [("u", None, bytearray(b"no markup at all"), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_blocs_html(pages).collect()
    assert len(out) == 1 and out[0].error


def test_annotation_overlay_color_assignment(spark):
    """Colors follow FIRST-OCCURRENCE label order per document (reference
    dict.fromkeys + zip, annotations.py:62-67); labels beyond the palette
    get NULL (zip truncation); pixel rects carry the ±2 px x-padding."""
    from edspdf_spark.operators.visualize import CATEGORY20, annotation_overlay
    from edspdf_spark.schemas import BLOC_SCHEMA

    rows = [
        ("u", 0, 0, 0.1, 0.1, 0.2, 0.2, None, [], "beta", False),
        ("u", 0, 1, 0.3, 0.3, 0.4, 0.4, None, [], "alpha", False),
        ("u", 1, 0, 0.5, 0.5, 0.6, 0.6, None, [], "beta", False),
    ]
    # 20 extra labels on a second doc to exercise palette truncation
    rows += [
        ("v", 0, i, 0.01 * i, 0.1, 0.01 * i + 0.05, 0.2, None, [], f"l{i:02d}", False)
        for i in range(20)
    ]
    out = annotation_overlay(
        spark.createDataFrame(rows, BLOC_SCHEMA), page_width=100.0, page_height=200.0
    ).collect()
    u = {(r.page_num, r.bloc_ord): r for r in out if r.url == "u"}
    # beta occurs first → first palette color, alpha second — NOT alphabetical
    assert u[(0, 0)].color == CATEGORY20[0]
    assert u[(0, 1)].color == CATEGORY20[1]
    assert u[(1, 0)].color == CATEGORY20[0]  # same label, same color
    v = sorted((r for r in out if r.url == "v"), key=lambda r: r.bloc_ord)
    assert [r.color for r in v[:18]] == CATEGORY20
    assert all(r.color is None for r in v[18:])  # zip truncation → no color
    r0 = u[(0, 0)]
    assert (r0.rect_x0, r0.rect_y0, r0.rect_x1, r0.rect_y1) == (
        0.1 * 100 - 2, 0.1 * 200, 0.2 * 100 + 2, 0.2 * 200
    )
    assert (r0.text_x, r0.text_y) == (-10 + 0.1 * 100, 0.1 * 200)


def test_render_pages_handles_unparseable_bytes():
    """render_pages is a real rasterizer since round 3
    (tests/test_pdf_bytes.py has the reference image-shape checks);
    unparseable bytes follow the extractor's error contract — no pages,
    no images, no raise."""
    from edspdf_spark.operators.visualize import render_pages

    assert render_pages(b"%PDF", []) == []


# --- Arc90-readability container scoring ------------------------------------


def test_readability_kernel_winner_and_labels():
    """Class-hinted content div must win; link-dense sidebar, chrome nav,
    and everything outside the winning subtree must be boilerplate."""
    from edspdf_spark.operators.extract_html import readability_blocks

    html = (
        b"<html><body>"
        b"<div id='sidebar'><a href='/a'>Link one</a> <a href='/b'>Link two</a></div>"
        b"<div class='content'><p>Real article text, with commas, and substance.</p>"
        b"<p>Second paragraph of the story, also real.</p></div>"
        b"<nav><a href='/'>Home</a> About</nav>"
        b"<p>Stray paragraph outside every container.</p>"
        b"</body></html>"
    )
    blocks, err = readability_blocks(html)
    assert not err
    by_text = {b["text"]: b["label"] for b in blocks}
    assert by_text["Real article text, with commas, and substance."] == "body"
    assert by_text["Second paragraph of the story, also real."] == "body"
    assert by_text["Link one Link two"] == "boilerplate"
    assert by_text["Home About"] == "boilerplate"
    # root did not win, so the stray paragraph is outside the winner subtree
    assert by_text["Stray paragraph outside every container."] == "boilerplate"


def test_readability_kernel_root_fallback():
    """With no candidate containers at all, the root wins and ordinary
    paragraphs are body."""
    from edspdf_spark.operators.extract_html import readability_blocks

    html = b"<html><body><p>Only a bare paragraph, nothing else.</p></body></html>"
    blocks, err = readability_blocks(html)
    assert not err
    assert [b["label"] for b in blocks] == ["body"]


def test_readability_kernel_negative_hint_loses():
    """A negative class hint (-25) must sink an otherwise wordy container
    when a neutral sibling holds comparable content."""
    from edspdf_spark.operators.extract_html import readability_blocks

    para = b"<p>Plenty of ordinary words fill this paragraph, with a comma.</p>"
    html = (
        b"<html><body>"
        b"<div class='comment'>" + para + b"</div>"
        b"<div>" + para + para + b"</div>"
        b"</body></html>"
    )
    blocks, err = readability_blocks(html)
    assert not err
    labels = [b["label"] for b in blocks]
    # the neutral div (two paragraphs) wins; the comment div loses
    assert labels == ["boilerplate", "body", "body"]


def test_readability_kernel_unbalanced_markup():
    """Unclosed containers must not crash or mis-pop the stack."""
    from edspdf_spark.operators.extract_html import readability_blocks

    html = (
        b"<html><body><div class='content'><p>Text that never closes its div, "
        b"with a comma, and more words to score.</p>"
        b"</body></html>"
    )
    blocks, err = readability_blocks(html)
    assert not err
    assert blocks[0]["label"] == "body"


def test_readability_spark_operator(spark):
    from edspdf_spark.operators.extract_html import extract_blocs_readability

    html = (
        b"<html><body>"
        b"<div id='sidebar'><a href='/a'>Link one</a> <a href='/b'>Link two</a></div>"
        b"<div class='content'><p>Real article text, with commas, and substance.</p>"
        b"<p>Second paragraph of the story, also real.</p></div>"
        b"</body></html>"
    )
    pages = spark.createDataFrame(
        [("u", None, bytearray(html), None, "en"),
         ("v", None, None, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = extract_blocs_readability(pages).collect()
    body = sorted(r.text for r in rows if r.label == "body")
    assert body == [
        "Real article text, with commas, and substance.",
        "Second paragraph of the story, also real.",
    ]
    errs = [r for r in rows if r.error]
    assert len(errs) == 1 and errs[0].url == "v"


def test_align_composite_null_field_keeps_slot(spark, doc_blocs):
    """A NULL node_num/rank renders as the literal 'None' IN ITS SLOT
    (the reference f-string), never collapsing the 3-field composite."""
    from edspdf_spark.operators.align import align_composite

    src = spark.createDataFrame(
        [("d", 0, 0.0, 0.0, 1.0, 1.0, "lab", 0, None, 3)], SRC_SCHEMA
    )
    out = align_composite(doc_blocs, src, threshold=0.0001).collect()
    assert out and all(r.label.count("|") == 2 for r in out)
    assert any(r.label == "lab|None|3" for r in out)


def test_find_cliques_matches_brute_force():
    """Bron–Kerbosch property check: only MAXIMAL cliques, exactly the
    brute-force set, across random graphs (a non-maximal subset yield
    used to re-mark seen boxes as conflicting and churn the merge
    re-key loop)."""
    import itertools

    import numpy as np

    from edspdf_spark.operators.merge import _find_cliques

    def brute(adj):
        n = len(adj)
        cl = []
        for r in range(1, n + 1):
            for c in itertools.combinations(range(n), r):
                if all(adj[i][j] for i in c for j in c if i != j):
                    cl.append(set(c))
        return sorted(
            tuple(sorted(c)) for c in cl if not any(c < d for d in cl)
        )

    rng = np.random.default_rng(0)
    for _ in range(120):
        n = int(rng.integers(1, 9))
        adj = rng.random((n, n)) < 0.4
        adj = np.triu(adj, 1)
        adj = adj | adj.T
        got = sorted(tuple(sorted(c)) for c in _find_cliques(adj))
        assert got == brute(adj)
