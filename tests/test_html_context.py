"""jusText-style context-sensitive block classification (pure python —
the Spark face is covered by the html_boilerplate oracle query).

Reference semantics: Pomikálek 2011 two-pass smoothing — short blocks
inherit 'good' only when BOTH nearest decided neighbors are good (document
edges count as bad); neargood blocks need at least one good neighbor.
"""

from edspdf_spark.operators.extract_html import (
    EN_STOPWORDS,
    context_classify,
    extract_html_blocks,
)


def blk(text, chrome=False, ld=0.0):
    return {
        "text": text,
        "n_words": len(text.split()),
        "link_density": ld,
        "chrome": chrome,
        "label": "",
    }


GOOD = blk("one two three four five six seven eight nine")  # 9 words
SHORT = blk("Read on")  # 2 words
NEAR = blk("four words sit here")  # 4 words: neargood band [3, 8)


def test_short_between_goods_is_rescued():
    assert context_classify([GOOD, SHORT, GOOD]) == ["body", "body", "body"]


def test_short_at_document_edge_stays_boilerplate():
    # edges count as bad: leading/trailing shorts are never rescued
    assert context_classify([SHORT, GOOD]) == ["boilerplate", "body"]
    assert context_classify([GOOD, SHORT]) == ["body", "boilerplate"]


def test_short_next_to_bad_stays_boilerplate():
    nav = blk("Home About Contact", chrome=True)
    assert context_classify([nav, SHORT, GOOD]) == [
        "boilerplate",
        "boilerplate",
        "body",
    ]


def test_neargood_needs_only_one_good_neighbor():
    nav = blk("Home About Contact", chrome=True)
    assert context_classify([nav, NEAR, GOOD]) == ["boilerplate", "body", "body"]
    assert context_classify([nav, NEAR, nav]) == [
        "boilerplate",
        "boilerplate",
        "boilerplate",
    ]


def test_chain_of_undecided_blocks_skips_to_decided_neighbor():
    # short+neargood run between two goods: the decided neighbors are the
    # goods on each side for every block in the run
    seq = [GOOD, SHORT, NEAR, SHORT, GOOD]
    assert context_classify(seq) == ["body"] * 5


def test_link_density_demotes_to_bad():
    linky = blk("a b c d e f g h i", ld=0.9)
    assert context_classify([GOOD, linky, GOOD]) == ["body", "boilerplate", "body"]


def test_stopword_floor_demotes_good_to_neargood():
    # 9 words, zero stopwords: with a floor every GOOD here is neargood,
    # so no decided good exists anywhere and the whole run falls
    labels = context_classify(
        [GOOD, SHORT, GOOD],
        stopwords=EN_STOPWORDS,
        stopword_low=0.1,
    )
    assert labels == ["boilerplate", "boilerplate", "boilerplate"]
    assert context_classify(
        [GOOD], stopwords=EN_STOPWORDS, stopword_low=0.1
    ) == ["boilerplate"]
    # a block rich in function words keeps its good class under the floor
    rich = blk("the cat is on the mat and it is there with a hat")
    assert context_classify(
        [rich], stopwords=EN_STOPWORDS, stopword_low=0.1
    ) == ["body"]


def test_template_end_to_end_block_segmentation():
    html = (
        "<html><nav><a href='/'>Menu</a> Home About</nav>"
        "<article><p>one two three four five six seven eight nine ten</p>"
        "<p>Read on</p>"
        "<p>This closing paragraph carries enough plain words to count as"
        " good content.</p></article>"
        "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a></footer>"
        "</html>"
    ).encode()
    blocks, err = extract_html_blocks(html)
    assert not err
    labels = context_classify(blocks)
    assert [b["text"] for b in blocks] == [
        "Menu Home About",
        "one two three four five six seven eight nine ten",
        "Read on",
        "This closing paragraph carries enough plain words to count as good"
        " content.",
        "Privacy Terms",
    ]
    assert labels == ["boilerplate", "body", "body", "body", "boilerplate"]
    # context-free labeling (the default path) marks the short block
    # boilerplate — the context pass is what rescues it
    assert [b["label"] for b in blocks] == [
        "boilerplate",
        "body",
        "boilerplate",
        "body",
        "boilerplate",
    ]


def test_extract_tables_cells(spark):
    """Structured table parse: cell grid indices, header detection,
    entity decode, tag strip, multi-table pages, tableless pages."""
    from edspdf_spark.operators.extract_html import extract_tables

    html = b"""<html><body>
    <script>var t = "<tr><td>fake</td></tr>";</script>
    <p>prose</p>
    <table class=x>
      <tr><th> Name </th><th>Score &amp;&#32;Rank</th></tr>
      <tr><td><b>alice</b></td><td>3 &lt; 5</td></tr>
      <tr><td>bob</td><td>caf&eacute;</td></tr>
    </table>
    <TABLE><TR><TD>second</TD></TR></TABLE>
    </body></html>"""
    pages = spark.createDataFrame(
        [("u1", html), ("u2", b"<p>no tables here</p>")], "url string, html binary"
    )
    got = {
        (r.url, r.table_idx, r.row_idx, r.col_idx): (r.is_header, r.cell)
        for r in extract_tables(pages).collect()
    }
    assert got[("u1", 0, 0, 0)] == (True, "Name")
    assert got[("u1", 0, 1, 0)] == (False, "alice")      # <b> stripped
    assert got[("u1", 0, 1, 1)] == (False, '3 < 5')      # &lt; decoded
    assert got[("u1", 0, 2, 1)][1] == "caf&eacute;"      # non-standard entity kept
    assert got[("u1", 1, 0, 0)] == (False, "second")     # case-insensitive tags
    assert ("u1", 0, 0, 1) in got and got[("u1", 0, 0, 1)][0] is True
    assert not any(u == "u2" for (u, *_), _ in got.items())
    assert not any(v[1] == "fake" for v in got.values())  # script stripped


# --- extract_lists / extract_code_blocks ---------------------------------------

from edspdf_spark.operators.extract_html import (
    extract_code_blocks,
    extract_lists,
)


def _struct_pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def test_extract_lists_ordered_and_cleanup(spark):
    html = (
        "<ul><li>alpha <b>bold</b></li><li>beta &amp; co</li></ul>"
        "<p>x</p>"
        "<ol class='steps'><li>first</li><li>second</li><li>third</li></ol>"
        "<script><ul><li>fake</li></ul></script>"
    )
    got = sorted(
        (r.list_idx, r.item_idx, r.ordered, r.item)
        for r in extract_lists(_struct_pages(spark, [("u", html)])).collect()
    )
    assert got == [
        (0, 0, False, "alpha bold"),
        (0, 1, False, "beta & co"),
        (1, 0, True, "first"),
        (1, 1, True, "second"),
        (1, 2, True, "third"),
    ]


def test_extract_lists_unclosed_last_item(spark):
    # the wild-web idiom: <li> items never closed
    html = "<ul><li>one<li>two<li>three</ul>"
    got = [
        r.item
        for r in extract_lists(_struct_pages(spark, [("u", html)]))
        .orderBy("item_idx")
        .collect()
    ]
    assert got == ["one", "two", "three"]


def test_extract_code_blocks_whitespace_and_hint(spark):
    html = (
        '<pre><code class="language-python">def f():\n    return 1</code></pre>'
        "<p>prose with <code>inline_call()</code> here</p>"
        "<pre>  plain\r\n  block</pre>"
    )
    got = {
        r.block_idx: (r.lang_hint, r.code)
        for r in extract_code_blocks(
            _struct_pages(spark, [("u", html)])
        ).collect()
    }
    # DOCUMENT order: pre, inline code, second pre
    assert got[0] == ("python", "def f():\n    return 1")
    assert got[1] == ("", "inline_call()")      # bare <code> outside pre
    assert got[2] == ("", "  plain\n  block")   # CRLF→LF, indent preserved
    assert len(got) == 3


def test_extract_code_blocks_entities_and_no_double_count(spark):
    html = "<pre>if a &lt; b &amp;&amp; c &gt; d:</pre>"
    got = extract_code_blocks(_struct_pages(spark, [("u", html)])).collect()
    assert [r.code for r in got] == ["if a < b && c > d:"]
