"""BM25 full-text relevance search over the corpus — the retrieval half
of a web-corpus engine (query → top-k documents), in the classic
inverted-index relational shape:

- ``build_text_index`` materializes POSTINGS ``(term, doc_id, tf)``,
  DOCUMENT FREQUENCIES ``(term, df)``, per-doc lengths ``(doc_id, dl)``
  and a one-row corpus stats frame — one tokenize pass, three keyed
  aggregations, exactly what a search engine's indexer computes. At
  10^12 docs the postings table is the big one and it is PARTITIONED BY
  TERM — a query touches only its terms' partitions, the relational
  analogue of reading one posting list.
- ``bm25_topk`` scores ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf +
  k1·(1−b+b·dl/avgdl))`` (Robertson/Sparck-Jones BM25, the Lucene
  default formula) with each per-(doc, term) contribution quantized to
  integer micro-units BEFORE the per-doc sum — the engine's standard
  determinism contract: identical results under any partitioning, and
  the DuckDB oracle replays the whole computation value-level. The only
  floats are one ``ln`` and one division per (term, doc) on exact
  integer inputs.

Plan shape per query: the query's terms form a tiny broadcast; postings
⨝ terms is a broadcast-hash join pruned to the query's terms; one
doc-keyed exchange for the score sum; top-k is a distributed
``TakeOrderedAndProject``. No corpus scan at query time — that is the
point of an index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: score quantum — 1e6 micro-units per BM25 point
BM25_QUANTUM = 1_000_000


def _terms(col: Column) -> Column:
    """Lowercased whitespace terms; blank → empty array (the tokenizer
    shared with the LM / DSIR families)."""
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.lower(col)), r"\s+")
    )


def build_text_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """One-pass corpus index: ``{"postings": (term, id, tf), "df":
    (term, df), "doclen": (id, dl), "stats": one row (n_docs,
    total_dl)}`` — all lazy; persist/write the postings table partitioned
    by term for repeated querying."""
    tokens = corpus.select(
        F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term")
    )
    postings = tokens.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_tab = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = corpus.select(
        F.col(id_col), F.size(_terms(F.col(text_col))).cast("long").alias("dl")
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total_dl"),
    )
    return {"postings": postings, "df": df_tab, "doclen": doclen, "stats": stats}


def bm25_topk(
    index: dict[str, DataFrame],
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    quantum: int = BM25_QUANTUM,
) -> DataFrame:
    """Top-``k`` documents for a query string. Query terms are the
    DISTINCT lowercased whitespace tokens (short-query convention).
    Returns ``(id, bm25_micro, n_hit_terms)`` ordered by score desc, id
    asc — integer ordering, ties deterministic."""
    spark = index["postings"].sparkSession
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        return spark.createDataFrame(
            [], f"{id_col} long, bm25_micro long, n_hit_terms long"
        )
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")
    # prune the VOCABULARY-SIZED df table down to the query's few terms
    # BEFORE broadcasting — broadcasting the full (term, df) table ships
    # every distinct corpus term to the driver and all executors (the
    # exact hazard tfidf_keywords documents). The pruned frame is ≤
    # len(terms) rows, a legitimate broadcast.
    qterms = F.broadcast(index["df"].join(F.broadcast(qdf), on="term"))
    hit = (
        index["postings"]
        .join(qterms, on="term")
        .join(index["doclen"], on=id_col)
        .crossJoin(F.broadcast(index["stats"]))
    )
    n = F.col("n_docs").cast("double")
    avgdl = F.col("total_dl").cast("double") / n
    idf = F.log(
        (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )
    contrib = F.floor(
        idf * tf * F.lit(float(k1) + 1.0) / denom * F.lit(float(quantum))
    ).cast("long")
    scored = (
        hit.select(F.col(id_col), contrib.alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("bm25_micro"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    return scored.orderBy(
        F.col("bm25_micro").desc(), F.col(id_col).asc()
    ).limit(int(k))

def tfidf_keywords(
    index: dict[str, DataFrame],
    k: int = 5,
    id_col: str = "doc_id",
    quantum: int = BM25_QUANTUM,
) -> DataFrame:
    """Per-document top-``k`` keywords by tf-idf over the same inverted
    index — the corpus-annotation face of retrieval (tag every page with
    its most distinctive terms).

    ``tfidf_micro = floor(tf · ln((n_docs + 1) / (df + 1)) · quantum)`` —
    smoothed idf, so a term present in EVERY document scores exactly 0
    and integer inputs feed one ``ln`` per (term, doc): the standard
    determinism contract (same result under any partitioning, DuckDB
    replays it value-level).

    Returns ``(id, rank, term, tf, tfidf_micro)`` with rank 1..k per doc,
    ordered by (tfidf_micro desc, term asc) — integer ordering, ties
    deterministic.

    Plan: postings ⨝ df is term-keyed on both sides (the df table is
    vocabulary-sized — NEVER broadcast it); the one-row stats frame is a
    broadcast; the per-doc top-k is a doc-keyed window whose partitions
    are bounded by a single document's distinct-term count, so no hot key
    can exceed one doc's length.
    """
    from pyspark.sql import Window

    hit = (
        index["postings"]
        .join(index["df"], on="term")
        .crossJoin(F.broadcast(index["stats"]))
    )
    idf = F.log(
        (F.col("n_docs").cast("double") + F.lit(1.0))
        / (F.col("df").cast("double") + F.lit(1.0))
    )
    score = F.floor(
        F.col("tf").cast("double") * idf * F.lit(float(quantum))
    ).cast("long")
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_micro").desc(), F.col("term").asc()
    )
    return (
        hit.select(F.col(id_col), "term", "tf", score.alias("tfidf_micro"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "rank", "term", "tf", "tfidf_micro")
    )
