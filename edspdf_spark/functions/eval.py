"""Extraction-quality evaluation: token-multiset precision/recall/F1 of
extracted text against a gold column, per document.

This is the standard main-content-extraction benchmark metric
(CleanEval / Scrapinghub article-extraction-benchmark style): tokenize
both sides on whitespace, score the multiset overlap. It closes the loop
on the north rule's "matching the reference's extracted text per
document" — instead of only asserting byte-identity on fixtures, the
engine can SCORE any extractor leg against any gold corpus at corpus
scale and aggregate the result.

Scale notes (10^12 docs):

- Tokenization is a zero-shuffle ``split`` + ``explode``; the only
  exchanges are ``(doc, token)``-keyed aggregations (map-side combined;
  key cardinality bounded by corpus token count, hot keys bounded by one
  document's length) and the final per-doc joins on the doc key.
- True-positive counting is exact-integer (``least`` of two bigint
  counts, summed) — no float accumulation order to worry about; the
  P/R/F1 divisions are single IEEE ops, so a sequential-SQL oracle
  reproduces them bit-for-bit.
- No collect, no crossJoin, no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_prf", "extraction_prf_oracle_sql"]


def _token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, cnt) multiset — whitespace tokenization, empties out."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )


def token_prf(
    extracted: DataFrame,
    gold: DataFrame,
    id_col: str = "url",
    extracted_text_col: str = "text",
    gold_text_col: str = "text",
) -> DataFrame:
    """Per-document token-multiset precision/recall/F1 of ``extracted``
    against ``gold`` (CleanEval-style scoring of a content extractor).

    Returns ``(id, n_extracted, n_gold, tp, precision, recall, f1)`` with
    one row per gold document (docs the extractor missed entirely score
    0.0); ``tp`` is the multiset intersection size
    ``Σ_tok min(cnt_extracted, cnt_gold)``. Documents with an empty gold
    side score ``recall = 1`` and ``precision = 0`` unless the extraction
    is also empty (then 1) — the usual empty-reference convention.
    """
    e = _token_counts(extracted, id_col, extracted_text_col)
    g = _token_counts(gold, id_col, gold_text_col)

    e_tot = e.groupBy("_id").agg(F.sum("cnt").alias("n_extracted"))
    g_tot = g.groupBy("_id").agg(F.sum("cnt").alias("n_gold"))
    tp = (
        e.join(g.withColumnRenamed("cnt", "cnt_g"), ["_id", "tok"])
        .select("_id", F.least("cnt", "cnt_g").alias("m"))
        .groupBy("_id")
        .agg(F.sum("m").alias("tp"))
    )

    gold_ids = gold.select(F.col(id_col).alias("_id")).distinct()
    base = (
        gold_ids.join(e_tot, "_id", "left")
        .join(g_tot, "_id", "left")
        .join(tp, "_id", "left")
        .select(
            "_id",
            F.coalesce("n_extracted", F.lit(0)).alias("n_extracted"),
            F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_extracted") == 0,
        F.when(F.col("n_gold") == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
    ).otherwise(F.col("tp") / F.col("n_extracted"))
    rec = F.when(F.col("n_gold") == 0, F.lit(1.0)).otherwise(
        F.col("tp") / F.col("n_gold")
    )
    f1 = F.when(prec + rec == 0, F.lit(0.0)).otherwise(
        2.0 * prec * rec / (prec + rec)
    )
    return base.select(
        F.col("_id").alias(id_col),
        "n_extracted",
        "n_gold",
        "tp",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )


def extraction_prf_oracle_sql(
    extracted_sql: str,
    gold_sql: str,
    id_col: str = "url",
) -> str:
    """DuckDB replica of :func:`token_prf`: ``extracted_sql`` / ``gold_sql``
    are subqueries yielding ``({id_col}, text)``."""
    return rf"""
WITH ex AS ({extracted_sql}),
gd AS ({gold_sql}),
etok AS (
  SELECT {id_col} AS _id, tok, COUNT(*) AS cnt
  FROM (SELECT {id_col}, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM ex)
  WHERE tok <> '' GROUP BY 1, 2
),
gtok AS (
  SELECT {id_col} AS _id, tok, COUNT(*) AS cnt
  FROM (SELECT {id_col}, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM gd)
  WHERE tok <> '' GROUP BY 1, 2
),
etot AS (SELECT _id, CAST(SUM(cnt) AS BIGINT) AS n_extracted FROM etok GROUP BY 1),
gtot AS (SELECT _id, CAST(SUM(cnt) AS BIGINT) AS n_gold FROM gtok GROUP BY 1),
tp AS (
  SELECT e._id, CAST(SUM(LEAST(e.cnt, g.cnt)) AS BIGINT) AS tp
  FROM etok e JOIN gtok g ON e._id = g._id AND e.tok = g.tok GROUP BY 1
),
base AS (
  SELECT ids._id,
         CAST(COALESCE(etot.n_extracted, 0) AS BIGINT) AS n_extracted,
         CAST(COALESCE(gtot.n_gold, 0) AS BIGINT) AS n_gold,
         CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp
  FROM (SELECT DISTINCT {id_col} AS _id FROM gd) ids
  LEFT JOIN etot USING (_id) LEFT JOIN gtot USING (_id) LEFT JOIN tp USING (_id)
),
scored AS (
  SELECT _id, n_extracted, n_gold, tp,
    CASE WHEN n_extracted = 0 THEN (CASE WHEN n_gold = 0 THEN 1.0 ELSE 0.0 END)
         ELSE CAST(tp AS DOUBLE) / n_extracted END AS precision,
    CASE WHEN n_gold = 0 THEN 1.0 ELSE CAST(tp AS DOUBLE) / n_gold END AS recall
  FROM base
)
SELECT _id AS {id_col}, n_extracted, n_gold, tp, precision, recall,
  CASE WHEN precision + recall = 0 THEN 0.0
       ELSE 2.0 * precision * recall / (precision + recall) END AS f1
FROM scored
"""
