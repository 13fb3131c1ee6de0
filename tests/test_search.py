"""BM25 corpus search: hand-checked scoring, determinism, DuckDB differential."""

from __future__ import annotations

import math

from edspdf_spark.functions.search import BM25_QUANTUM, bm25_topk, build_text_index


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle partitions spark"),
            (2, "spark join"),
            (3, "pandas dataframe join join join"),
            (4, "unrelated words entirely"),
            (5, "   "),
        ],
        "doc_id int, text string",
    )


def _bm25_ref(tf, df, dl, n, total_dl, k1=1.2, b=0.75):
    avgdl = total_dl / n
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return math.floor(
        idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)) * BM25_QUANTUM
    )


def test_bm25_hand_values(spark):
    idx = build_text_index(_corpus(spark))
    got = {
        r.doc_id: (r.bm25_micro, r.n_hit_terms)
        for r in bm25_topk(idx, "spark join", k=10).collect()
    }
    n, total = 5, 4 + 2 + 5 + 3 + 0
    expect1 = _bm25_ref(2, 2, 4, n, total)  # doc1: spark tf=2
    expect2 = _bm25_ref(1, 2, 2, n, total) + _bm25_ref(1, 2, 2, n, total)
    expect3 = _bm25_ref(3, 2, 5, n, total)  # doc3: join tf=3
    assert got[1] == (expect1, 1)
    assert got[2] == (expect2, 2)
    assert got[3] == (expect3, 1)
    assert 4 not in got and 5 not in got
    # doc2 hits BOTH query terms → must outrank the single-term docs
    assert got[2][0] > got[1][0] and got[2][0] > got[3][0]


def test_bm25_topk_order_and_empty_query(spark):
    idx = build_text_index(_corpus(spark))
    top = [r.doc_id for r in bm25_topk(idx, "spark join", k=2).collect()]
    assert len(top) == 2 and top[0] == 2
    assert bm25_topk(idx, "   ", k=5).count() == 0
    assert bm25_topk(idx, "zzz-not-present", k=5).count() == 0


def test_bm25_matches_duckdb(spark):
    import duckdb

    rows = [(i, f"term{i % 7} term{i % 3} filler{i} term{i % 7}") for i in range(60)]
    corpus = spark.createDataFrame(rows, "doc_id int, text string")
    idx = build_text_index(corpus)
    got = sorted(
        (r.doc_id, r.bm25_micro, r.n_hit_terms)
        for r in bm25_topk(idx, "term1 term2", k=60).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT i AS doc_id, 'term' || (i % 7) || ' term' || (i % 3)"
        " || ' filler' || i || ' term' || (i % 7) AS text FROM range(60) t(i)"
    )
    sql = """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM docs
),
postings AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY term, doc_id),
dfs AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
st AS (SELECT COUNT(*) AS n, SUM(dl) AS total FROM dl)
SELECT p.doc_id,
  CAST(SUM(CAST(floor(
    ln((n - df + 0.5) / (df + 0.5) + 1.0)
      * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(total AS DOUBLE) / n)))
      * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
  CAST(COUNT(*) AS BIGINT) AS h
FROM postings p
JOIN dfs USING (term) JOIN dl ON p.doc_id = dl.doc_id, st
WHERE term IN ('term1', 'term2')
GROUP BY p.doc_id
"""
    want = sorted((int(a), int(b_), int(c)) for a, b_, c in con.execute(sql).fetchall())
    assert got == want


def _tfidf_ref(tf, df, n):
    return math.floor(tf * math.log((n + 1) / (df + 1)) * BM25_QUANTUM)


def test_tfidf_keywords_hand_values(spark):
    """Hand corpus: per-doc ranks by (tfidf desc, term asc); ubiquitous
    terms score 0 but still rank; blank doc yields no rows."""
    from edspdf_spark.functions.search import tfidf_keywords

    idx = build_text_index(_corpus(spark))
    got = {}
    for r in tfidf_keywords(idx, k=10).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf, r.tfidf_micro))
    n = 5
    # doc1 terms: spark tf=2 df=2, shuffle tf=1 df=1, partitions tf=1 df=1
    d1 = sorted(got[1])
    assert d1 == [
        (1, "spark", 2, _tfidf_ref(2, 2, n)),
        (2, "partitions", 1, _tfidf_ref(1, 1, n)),
        (3, "shuffle", 1, _tfidf_ref(1, 1, n)),
    ]
    # tie between partitions/shuffle broken alphabetically
    assert _tfidf_ref(1, 1, n) == d1[1][3] == d1[2][3]
    # doc3: join tf=3 df=2 outranks pandas/dataframe tf=1 df=1
    assert got[3][0][1] == "join" if got[3][0][0] == 1 else True
    d3 = {r[1]: (r[0], r[3]) for r in got[3]}
    assert d3["join"] == (1, _tfidf_ref(3, 2, n))
    # blank doc 5 emits nothing
    assert 5 not in got


def test_tfidf_keywords_k_cut_and_duckdb(spark):
    """k cuts per-doc lists; DuckDB replays the whole scoring + ranking."""
    import duckdb

    from edspdf_spark.functions.search import tfidf_keywords

    rows = [(i, f"t{i % 7} t{i % 3} only{i} t{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(
        (r.doc_id, r.rank, r.term, r.tf, r.tfidf_micro)
        for r in tfidf_keywords(build_text_index(df), k=2).collect()
    )
    assert all(rk <= 2 for _, rk, _, _, _ in got)
    duckdb.sql("CREATE OR REPLACE TABLE docs AS SELECT * FROM (VALUES "
               + ",".join(f"({i}, 't{i % 7} t{i % 3} only{i} t{i % 7}')" for i in range(40))
               + ") t(doc_id, text)")
    want = duckdb.sql("""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM docs
),
post AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM docs),
scored AS (
  SELECT p.doc_id, p.term, p.tf,
         CAST(floor(CAST(p.tf AS DOUBLE)
              * ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(d.df AS DOUBLE) + 1.0))
              * 1000000.0) AS BIGINT) AS s
  FROM post p JOIN dft d USING (term), n
),
rk AS (
  SELECT doc_id, term, tf, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tf, s FROM rk WHERE rank <= 2 ORDER BY doc_id, rank
""").fetchall()
    assert got == [tuple(w) for w in want]


def test_tfidf_keywords_partitioning_invariance(spark):
    from edspdf_spark.functions.search import tfidf_keywords

    rows = [(i, f"a{i % 5} b{i % 11} c{(i * 3) % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = sorted(
        tuple(r) for r in tfidf_keywords(build_text_index(df.repartition(1)), k=3).collect()
    )
    b = sorted(
        tuple(r) for r in tfidf_keywords(build_text_index(df.repartition(16)), k=3).collect()
    )
    assert a == b
