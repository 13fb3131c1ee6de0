"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling", public
paper): score every raw document by how target-like its hashed n-gram
profile is, then resample a training subset with the Gumbel top-k trick —
the standard recipe for carving a domain-matched training set out of a
Common-Crawl-scale corpus.

Everything is relational, nothing is collected:

- ``fit_dsir`` learns the two bucket distributions — target ``p`` and raw
  ``q`` — as count tables over ``m_buckets`` hashed unigram+bigram
  buckets (two explode → groupBy aggregations with map-side partials; the
  bucket table is bounded by ``m_buckets`` rows regardless of corpus
  size, so the fitted model broadcasts).
- ``with_importance`` scores docs: per-doc bucket counts (one
  (doc, bucket)-keyed aggregation), a broadcast join against the bounded
  ratio table, one doc-keyed sum.
- ``importance_resample`` draws the subset: Gumbel top-k over the log
  weights, i.e. ``argtop_n(log w(x) + g_x)`` with ``g_x`` a deterministic
  per-doc Gumbel draw — a distributed ``TakeOrderedAndProject``, no
  global sort materialization.

Determinism contract (same discipline as ``functions/lm.py``): each
bucket's log-likelihood-ratio is quantized to integer micro-units
``floor((ln p_k − ln q_k) · quantum)`` BEFORE any summation, so a doc's
score is an exact BIGINT dot product ``Σ c_k · lr_k`` — independent of
partitioning, join order and float summation order, and replayable
bit-for-bit by the DuckDB oracle. The Gumbel draws come from the same
md5-derived polynomial hash the MinHash family uses, so the resample is
one deterministic integer ordering in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edspdf_spark.functions.dedup import MERSENNE

#: log-ratio quantum: 1e4 micro-units per nat (see lm.LP_QUANTUM — coarse
#: enough that a last-ulp ln() disagreement essentially never flips
#: floor(), fine enough that scores separate clearly).
DSIR_QUANTUM = 10_000.0


def _tokens(col: Column) -> Column:
    """Whitespace tokenizer shared with the LM/quality families
    (lowercased); blank text yields an empty array, not ``[""]``."""
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.lower(col)), r"\s+")
    )


def _ngrams(col: Column) -> Column:
    """Unigrams + space-joined bigrams (the DSIR paper's feature set)."""
    t = _tokens(col)
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bigrams)


def _hex15_hash(key: Column) -> Column:
    """Numeric value of the first 15 hex chars of ``md5(key)`` — a
    uniform 60-bit integer that fits BIGINT exactly. Spark evaluates it
    as ONE ``conv`` builtin (measured 2.3× cheaper per scan than the
    15-step polynomial fold on 0.5M n-grams); the DuckDB oracle computes
    the identical value with an exact 15-step hex-digit fold."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _bucket(ng: Column, m_buckets: int) -> Column:
    """Hash an n-gram into one of ``m_buckets`` buckets."""
    return _hex15_hash(ng) % F.lit(int(m_buckets))


def _bucket_counts(
    df: DataFrame, text_col: str, m_buckets: int
) -> DataFrame:
    """(bucket, c) counts over a corpus — at most ``m_buckets`` rows."""
    return (
        df.select(F.explode(_ngrams(F.col(text_col))).alias("ng"))
        .select(_bucket(F.col("ng"), m_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def fit_dsir(
    target: DataFrame,
    source: DataFrame,
    text_col: str = "text",
    m_buckets: int = 1024,
    quantum: float = DSIR_QUANTUM,
) -> dict[str, DataFrame]:
    """Fit the importance model: per-bucket quantized log-likelihood
    ratios ``lr_micro = floor((ln p_k − ln q_k) · quantum)`` with add-one
    smoothing ``p_k = (ct_k + 1) / (Nt + m)`` (ditto ``q``), plus the
    default ratio for buckets unseen in BOTH corpora (``ct = cs = 0``).

    Returns lazy ``{"ratio": (bucket, lr_micro), "default": one row
    (lr0_micro,)}``. Both are bounded by ``m_buckets`` rows — broadcast
    material at any corpus size; only the two fitting aggregations scan
    data.
    """
    t_counts = _bucket_counts(target, text_col, m_buckets)
    s_counts = _bucket_counts(source, text_col, m_buckets)
    ratio, default = _ratio_tables(t_counts, s_counts, m_buckets, quantum)
    return {"ratio": ratio, "default": default}


def _ratio_tables(
    t_counts: DataFrame,
    s_counts: DataFrame,
    m_buckets: int,
    quantum: float,
) -> tuple[DataFrame, DataFrame]:
    """Shared smoothing/quantization math for :func:`fit_dsir` and
    :func:`dsir_select`: (target, source) bucket-count tables →
    (``ratio`` (bucket, lr_micro), ``default`` one row (lr0_micro,)).

    Totals derive FROM the count tables (Σ_k c_k ≡ total n-gram count),
    not a fresh corpus scan: the totals agg then sits on the same
    bucket-keyed exchange as the ratio join's input, so ReuseExchange
    dedupes it — one scan per corpus for the whole fit, not two."""
    t_tot = t_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("nt"))
    s_tot = s_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("ns"))
    totals = t_tot.crossJoin(s_tot)
    m = F.lit(float(m_buckets))
    q = F.lit(float(quantum))

    def lr_micro(ct: Column, cs: Column) -> Column:
        p = (ct + 1).cast("double") / (F.col("nt").cast("double") + m)
        qq = (cs + 1).cast("double") / (F.col("ns").cast("double") + m)
        return F.floor((F.log(p) - F.log(qq)) * q).cast("long")

    ratio = (
        t_counts.withColumnRenamed("c", "ct")
        .join(s_counts.withColumnRenamed("c", "cs"), on="bucket", how="full_outer")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            lr_micro(
                F.coalesce(F.col("ct"), F.lit(0)),
                F.coalesce(F.col("cs"), F.lit(0)),
            ).alias("lr_micro"),
        )
    )
    default = totals.select(lr_micro(F.lit(0), F.lit(0)).alias("lr0_micro"))
    return ratio, default


def with_importance(
    df: DataFrame,
    dsir: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 1024,
) -> DataFrame:
    """Append the DSIR importance score to every doc:

    - ``dsir_n_ngrams`` — scored feature count (0 for blank docs)
    - ``dsir_lw_micro`` — exact BIGINT ``Σ_k c_k · lr_micro(k)``, the
      quantized log importance weight

    Plan shape: n-gram explode → one (doc, bucket)-keyed aggregation →
    broadcast join against the bounded ratio table → one doc-keyed sum →
    LEFT join back onto ``df``. The only corpus-wide exchanges are keyed
    on (doc, bucket) and doc — no collect, no skewed hot key (buckets are
    hash-uniform by construction).
    """
    doc_buckets = (
        df.select(
            F.col(id_col), F.explode(_ngrams(F.col(text_col))).alias("ng")
        )
        .select(id_col, _bucket(F.col("ng"), m_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        doc_buckets.join(F.broadcast(dsir["ratio"]), on="bucket", how="left")
        .crossJoin(F.broadcast(dsir["default"]))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("dsir_n_ngrams"),
            F.sum(
                F.col("c") * F.coalesce(F.col("lr_micro"), F.col("lr0_micro"))
            ).alias("dsir_lw_micro"),
        )
    )
    out = df.join(scored, on=id_col, how="left")
    return out.select(
        *df.columns,
        F.coalesce(F.col("dsir_n_ngrams"), F.lit(0)).alias("dsir_n_ngrams"),
        F.coalesce(F.col("dsir_lw_micro"), F.lit(0)).alias("dsir_lw_micro"),
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 1024,
    seed: int = 1,
    quantum: float = DSIR_QUANTUM,
) -> DataFrame:
    """One-stop fit+score+resample where the SOURCE distribution is the
    scored corpus itself (the common DSIR deployment): builds the
    per-doc bucket table ONCE and derives the source bucket counts from
    it (``Σ_docs c`` — the rollup consumes the same (doc, bucket)-keyed
    exchange AQE already materialized for scoring, so the corpus is
    n-gram-exploded exactly once; the target slice scan is the only
    other data pass). Returns the Gumbel top-``n`` rows of ``df`` with
    the score columns appended."""
    doc_buckets = (
        df.select(
            F.col(id_col), F.explode(_ngrams(F.col(text_col))).alias("ng")
        )
        .select(id_col, _bucket(F.col("ng"), m_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t_counts = _bucket_counts(target, text_col, m_buckets)
    s_counts = doc_buckets.groupBy("bucket").agg(F.sum("c").alias("c"))
    ratio, _default = _ratio_tables(t_counts, s_counts, m_buckets, quantum)
    scored = (
        doc_buckets.join(F.broadcast(ratio), on="bucket", how="inner")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("dsir_n_ngrams"),
            F.sum(F.col("c") * F.col("lr_micro")).alias("dsir_lw_micro"),
        )
    )
    out = df.join(scored, on=id_col, how="left").select(
        *df.columns,
        F.coalesce(F.col("dsir_n_ngrams"), F.lit(0)).alias("dsir_n_ngrams"),
        F.coalesce(F.col("dsir_lw_micro"), F.lit(0)).alias("dsir_lw_micro"),
    )
    return importance_resample(out, n, id_col=id_col, seed=seed, quantum=quantum)


def gumbel_key_micro(
    id_col: Column, seed: int, quantum: float = DSIR_QUANTUM
) -> Column:
    """Deterministic per-doc Gumbel draw in integer micro-units:
    ``floor(−ln(−ln(u)) · quantum)`` with ``u = (H + 1) / (P + 2)`` and
    ``H`` the md5-derived hex hash of ``seed|id`` reduced mod the Mersenne
    prime — engine-portable, open interval so the logs are finite."""
    h = _hex15_hash(F.concat(F.lit(f"{seed}|"), id_col.cast("string"))) % F.lit(
        MERSENNE
    )
    u = (h + 1).cast("double") / F.lit(float(MERSENNE + 2))
    return F.floor(-F.log(-F.log(u)) * F.lit(float(quantum))).cast("long")


def importance_resample(
    scored: DataFrame,
    n: int,
    id_col: str = "doc_id",
    seed: int = 1,
    quantum: float = DSIR_QUANTUM,
) -> DataFrame:
    """Gumbel top-k resample: keep the ``n`` docs with the largest
    ``dsir_lw_micro + floor(gumbel · quantum)`` — an exact integer
    ordering, ties broken by id, executed as a distributed top-k
    (``TakeOrderedAndProject``: each partition keeps ``n`` candidates,
    the driver merges ``n · partitions`` rows — no global sort, no
    full-corpus collect). Appends ``dsir_key_micro``."""
    key = F.col("dsir_lw_micro") + gumbel_key_micro(
        F.col(id_col), seed, quantum
    )
    return (
        scored.withColumn("dsir_key_micro", key)
        .orderBy(F.col("dsir_key_micro").desc(), F.col(id_col).asc())
        .limit(int(n))
    )
