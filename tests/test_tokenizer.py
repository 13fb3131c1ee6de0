"""Subword tokenizer: vocab build laws + greedy encode round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from edspdf_spark.functions.tokenizer import (
    BOUNDARY,
    UNK,
    build_subword_vocab,
    tokenize_subword,
)


def _corpus(spark):
    rows = [(i, "the shuffle the shuffles reshuffle then") for i in range(10)]
    rows += [(100, "zzz")]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_vocab_build(spark):
    vocab = build_subword_vocab(_corpus(spark), size=200, max_piece_len=6)
    pieces = {r.piece: r.n for r in vocab.collect()}
    # all single characters of the corpus present (incl. the boundary mark)
    for ch in set(BOUNDARY + "theshufflesrzn"):
        assert ch in pieces, ch
    # frequent multi-char pieces made it
    assert "shuffl" in pieces or "huffl" in pieces
    assert f"{BOUNDARY}the" in pieces
    # counts: '▁the' occurs in 'the'(×2 per doc) and 'then' per doc
    assert pieces[f"{BOUNDARY}the"] == 30


def test_tokenize_roundtrip_and_budget(spark):
    corpus = _corpus(spark)
    vocab = build_subword_vocab(corpus, size=120, max_piece_len=6)
    out = tokenize_subword(corpus, vocab)
    rows = out.collect()
    for r in rows:
        joined = "".join(p for p in r.pieces if p != UNK)
        expected = "".join(
            BOUNDARY + w for w in r.text.lower().split()
        )
        assert joined == expected  # lossless round-trip (no unseen chars)
        assert r.n_pieces == len(r.pieces)
    # greedy law: the frequent whole word '▁the' encodes as ONE piece
    by_id = {r.doc_id: r.pieces for r in rows}
    assert f"{BOUNDARY}the" in by_id[0]
    # determinism
    again = {r.doc_id: r.pieces for r in tokenize_subword(corpus, vocab).collect()}
    assert by_id == again


def test_tokenize_unseen_chars_unk(spark):
    corpus = _corpus(spark)
    vocab = build_subword_vocab(corpus, size=120, max_piece_len=6)
    fresh = spark.createDataFrame([(1, "thé qqq")], "doc_id int, text string")
    r = tokenize_subword(fresh, vocab).collect()[0]
    assert UNK in r.pieces  # é never seen
    # q was seen? no — corpus has no q → unk; all other chars encode
    assert r.n_pieces >= 4


def test_vocab_matches_duckdb(spark):
    import duckdb

    corpus = spark.createDataFrame(
        [(i, f"alpha beta{i % 3} gamma") for i in range(30)],
        "doc_id int, text string",
    )
    got = sorted(
        (r.piece, r.n)
        for r in build_subword_vocab(corpus, size=50, max_piece_len=4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT 'alpha beta' || (i % 3) || ' gamma' AS text"
        " FROM range(30) t(i)"
    )
    sql = f"""
WITH words AS (
  SELECT '{BOUNDARY}' || UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
  FROM docs
),
pieces AS (
  SELECT substr(w, i, l) AS piece
  FROM words,
       UNNEST(generate_series(1, length(w))) AS t(i),
       UNNEST(generate_series(1, least(4, length(w) - i + 1))) AS u(l)
),
counts AS (SELECT piece, COUNT(*) AS n FROM pieces GROUP BY piece),
singles AS (SELECT piece, n, 0 AS s FROM counts WHERE length(piece) = 1),
multis AS (
  SELECT piece, n, 1 AS s FROM counts WHERE length(piece) > 1
  ORDER BY n DESC, piece LIMIT 50
)
SELECT piece, n FROM (
  SELECT * FROM singles UNION ALL SELECT * FROM multis
  ORDER BY s, n DESC, piece LIMIT 50
)
"""
    want = sorted((p, int(n)) for p, n in con.execute(sql).fetchall())
    assert got == want


def test_fit_bpe_hand_computed(spark):
    from edspdf_spark.functions.tokenizer import fit_bpe

    # corpus: "aaaa" x2, "abab" x1 (as one doc each to weight by count)
    df = spark.createDataFrame(
        [(1, "aaaa aaaa abab")], "doc_id int, text string"
    )
    merges, words = fit_bpe(df, n_merges=2)
    got = [(r.rank, r.left, r.right, r.n) for r in merges.orderBy("rank").collect()]
    # pairs round 0: (a,a)=3*2=6 beats (▁,a)=3, (a,b)=2, (b,a)=1
    assert got[0] == (0, "a", "a", 6)
    # round 1 on [▁,aa,aa]x2 + [▁,a,b,a,b]: (▁,aa)=2, (aa,aa)=2, (▁,a)=1,
    # (a,b)=2, (b,a)=1 → tie on n=2 broken lexicographically: (a,b)
    assert got[1] == (1, "a", "b", 2)
    segs = {r.w: list(r.syms) for r in words.collect()}
    assert segs["▁aaaa"] == ["▁", "aa", "aa"]
    assert segs["▁abab"] == ["▁", "ab", "ab"]


def test_bpe_serve_reproduces_training_segmentation(spark):
    from edspdf_spark.functions.tokenizer import fit_bpe, tokenize_bpe

    df = spark.createDataFrame(
        [(i, f"the quick brown fox fox the {i % 3}") for i in range(30)],
        "doc_id int, text string",
    )
    merges, words = fit_bpe(df, n_merges=6)
    served = tokenize_bpe(df.limit(5), merges)
    train_seg = {r.w: list(r.syms) for r in words.collect()}
    for row in served.collect():
        pieces, i = row.pieces, 0
        for w in row.text.lower().split():
            seg = train_seg["▁" + w]
            assert pieces[i : i + len(seg)] == seg
            i += len(seg)
        assert i == len(pieces) == row.n_pieces


def test_fit_bpe_partitioning_invariant(spark):
    from edspdf_spark.functions.tokenizer import fit_bpe

    df = spark.createDataFrame(
        [(i, f"pack my box with {i % 5} dozen jugs") for i in range(40)],
        "doc_id int, text string",
    )
    m1, _ = fit_bpe(df.repartition(1), n_merges=5)
    m2, _ = fit_bpe(df.repartition(16), n_merges=5)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_fit_bpe_empty_corpus(spark):
    from edspdf_spark.functions.tokenizer import fit_bpe

    df = spark.createDataFrame([], "doc_id int, text string")
    merges, words = fit_bpe(df, n_merges=3)
    assert merges.count() == 0 and words.count() == 0


def test_vocab_keeps_all_singles_when_alphabet_exceeds_size(spark):
    """Completeness guarantee: when the corpus alphabet alone exceeds
    ``size``, EVERY seen single character stays in the vocab (the old
    trim-to-size ordering dropped the rarest singles, making greedy
    encoding emit UNK on seen text)."""
    import string

    from edspdf_spark.functions.tokenizer import (
        BOUNDARY,
        UNK,
        build_subword_vocab,
        tokenize_subword,
    )

    chars = string.ascii_lowercase + string.digits  # 36 distinct chars
    df = spark.createDataFrame([(0, " ".join(chars))], "doc_id long, text string")
    vocab = build_subword_vocab(df, size=16, max_piece_len=4)
    rows = vocab.collect()
    singles = {r.piece for r in rows if len(r.piece) == 1}
    assert singles == set(chars) | {BOUNDARY}
    # size=16 < 37 singles -> zero slots left for multis
    assert all(len(r.piece) == 1 for r in rows)
    # and encoding seen text never hits UNK
    toks = tokenize_subword(df, vocab)
    assert all(
        UNK not in r.pieces for r in toks.collect()
    )
