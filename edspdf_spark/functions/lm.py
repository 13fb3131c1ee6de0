"""CCNet-style n-gram language-model perplexity scoring for webtext
quality filtering (Wenzek et al. 2020 "CCNet", public): train a bigram LM
on a reference slice of the corpus, score every document by its
per-bigram log-probability, and gate training data on the resulting
perplexity — low-perplexity ≈ fluent prose, high-perplexity ≈ gibberish,
boilerplate soup, or the wrong language.

Everything is relational — the LM *is* a pair of count DataFrames:

- ``train_bigram_lm`` builds ``(w1, w2, c12)`` bigram counts, ``(w1, c1)``
  context counts (derived from the bigram table so probabilities
  normalize exactly: ``sum_w2 c12(w1,w2) == c1(w1)``), and a one-row
  vocab-size frame. All three are lazy groupBy aggregations with map-side
  partials; nothing is collected to the driver and nothing large is
  broadcast — at web scale the bigram table has billions of rows and is
  JOINED, not shipped.
- ``with_perplexity`` scores docs by exploding their bigrams, LEFT-joining
  the count tables (shuffle keyed on the bigram / context word — balanced
  by hash; a hot probe key like "of the" is a plain equi-join AQE can
  skew-split), add-one smoothing ``p = (c12 + 1) / (c1 + V)``, and one
  doc-keyed aggregation.

Determinism contract: each bigram's log-prob is quantized to integer
micro-units ``floor(ln(p) · quantum)`` BEFORE summation, so the per-doc
score is an exact integer sum — independent of partitioning, join order,
and float summation order, and replayable bit-for-bit by the DuckDB
oracle (the only cross-engine float ops are one IEEE division, one ``ln``
and one multiply on identical doubles; a last-ulp ``ln`` difference flips
``floor`` only when ``ln(p)·quantum`` sits within an ulp of an integer).
The convenience ``ppl`` column is derived FROM the integer sum, so it is
equally order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: log-prob quantum: 1e4 micro-units per nat. Coarse enough that a
#: last-ulp ln() disagreement essentially never flips floor(), fine
#: enough that doc scores separate clearly.
LP_QUANTUM = 10_000.0


def _tokens(col: Column) -> Column:
    """Whitespace tokenizer shared with the quality family (lowercased);
    empty/blank text yields an empty array, not ``[""]``."""
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.lower(col)), r"\s+")
    )


def _bigrams(col: Column) -> Column:
    """Array of (w1, w2) structs for consecutive token pairs; fewer than
    two tokens yields an empty array."""
    t = _tokens(col)
    n = F.size(t)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def train_bigram_lm(
    train: DataFrame, text_col: str = "text"
) -> dict[str, DataFrame]:
    """Count-table bigram LM from a reference corpus slice.

    Returns lazy DataFrames ``{"bigrams": (w1, w2, c12), "contexts":
    (w1, c1), "vocab": (v,)}``. ``c1`` is the row count of the bigram
    table per ``w1`` (so ``p(·|w1)`` sums to 1 under add-one smoothing);
    ``v`` is the distinct token count of the training slice plus one
    (the extra type absorbs every out-of-vocabulary word).
    """
    pairs = train.select(F.explode(_bigrams(F.col(text_col))).alias("bg")).select(
        "bg.w1", "bg.w2"
    )
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    contexts = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        train.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .agg((F.count_distinct("w") + 1).alias("v"))
    )
    return {"bigrams": bigrams, "contexts": contexts, "vocab": vocab}


def with_perplexity(
    df: DataFrame,
    lm: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    quantum: float = LP_QUANTUM,
) -> DataFrame:
    """Score each doc under the LM; appends three columns:

    - ``lm_n_bigrams`` — scored bigram count (0 for docs under 2 tokens)
    - ``lm_lp_micro``  — exact integer sum of per-bigram
      ``floor(ln(p) · quantum)`` (0 when no bigrams)
    - ``ppl``          — ``exp(−lp_micro / quantum / n_bigrams)``, the
      usual perplexity, derived from the integer sum (NULL when no
      bigrams)

    Plan shape: bigram posexplode → two LEFT equi-joins against the count
    tables (both shuffle-keyed on their join word; the one-row vocab frame
    is a broadcast) → one ``id_col``-keyed aggregation → LEFT join back
    onto ``df``. No collect, no large broadcast, no window over the
    corpus.
    """
    exploded = df.select(
        F.col(id_col), F.explode(_bigrams(F.col(text_col))).alias("bg")
    ).select(id_col, "bg.w1", "bg.w2")
    joined = (
        exploded.join(lm["bigrams"], on=["w1", "w2"], how="left")
        .join(lm["contexts"], on="w1", how="left")
        .crossJoin(F.broadcast(lm["vocab"]))
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
    ).cast("double")
    lp = F.floor(F.log(p) * F.lit(quantum)).cast("long")
    scores = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("lm_n_bigrams"),
        F.sum(lp).alias("lm_lp_micro"),
    )
    out = df.join(scores, on=id_col, how="left")
    n = F.coalesce(F.col("lm_n_bigrams"), F.lit(0))
    s = F.coalesce(F.col("lm_lp_micro"), F.lit(0))
    return out.select(
        *df.columns,
        n.alias("lm_n_bigrams"),
        s.alias("lm_lp_micro"),
        F.when(
            n > 0, F.exp(-(s.cast("double") / F.lit(quantum)) / n.cast("double"))
        ).alias("ppl"),
    )


def perplexity_buckets(
    df: DataFrame,
    lm: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    sample_mod: int = 1,
    seed: str = "pplbkt",
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4): per
    language, cut the corpus into perplexity terciles — 'head' is the
    most-fluent third that real pipelines train on first. Appends
    ``nlp_milli`` (the integer ppl proxy) and ``ppl_bucket``.

    Determinism + scale contract:

    - the per-doc score is ``nlp_milli = floor(−lp_micro · 1000 /
      n_bigrams)`` — a BIGINT floor-division of the already-exact integer
      LM sum, monotone in perplexity, so bucket boundaries are integer
      comparisons that replay bit-for-bit in the oracle (no float
      quantiles, no interpolation-semantics mismatch);
    - thresholds come from a DETERMINISTIC md5-hash sample (``sample_mod``
      keeps 1/mod of docs — CCNet likewise cuts on a fixed slice, and at
      10^12 docs an exact corpus-wide order statistic would be a global
      sort; the sample is bounded so its per-lang row_number window is
      cheap), rank-based: t1/t2 are the sample values at rows
      ``ceil(n/3)`` / ``ceil(2n/3)`` in ``(nlp_milli, id)`` order;
    - the threshold frame is one tiny row per language → broadcast join;
      assignment is a pure projection. Docs with no scoreable bigram, and
      languages absent from the sample, get bucket 'unscored' (CCNet drops
      them; keeping them tagged lets the caller decide).
    """
    from edspdf_spark.functions.dsir import _hex15_hash

    scored = with_perplexity(df, lm, text_col=text_col, id_col=id_col)
    # pure BIGINT floor-division (both operands non-negative: p < 1
    # strictly under add-one smoothing, so −lp_micro ≥ n_bigrams > 0) —
    # no double anywhere, so the oracle's `//` agrees bit-for-bit
    nlp = F.when(
        F.col("lm_n_bigrams") > 0,
        F.expr("CAST((-lm_lp_micro) * 1000 DIV lm_n_bigrams AS BIGINT)"),
    )
    scored = scored.withColumn("nlp_milli", nlp)
    sample = scored.where(
        F.col("nlp_milli").isNotNull()
        & (
            _hex15_hash(
                F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
            )
            % F.lit(int(sample_mod))
            == 0
        )
    ).select(lang_col, id_col, "nlp_milli")
    from pyspark.sql import Window

    w = Window.partitionBy(lang_col).orderBy("nlp_milli", id_col)
    ranked = sample.select(
        lang_col,
        "nlp_milli",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(lang_col)).alias("n"),
    )
    thresholds = (
        ranked.where(
            (F.col("rn") == F.ceil(F.col("n") / 3))
            | (F.col("rn") == F.ceil(F.col("n") * 2 / 3))
        )
        .groupBy(lang_col)
        .agg(
            F.min("nlp_milli").alias("t1"),
            F.max("nlp_milli").alias("t2"),
        )
    )
    out = scored.join(F.broadcast(thresholds), on=lang_col, how="left")
    bucket = (
        F.when(F.col("nlp_milli").isNull() | F.col("t1").isNull(), "unscored")
        .when(F.col("nlp_milli") <= F.col("t1"), "head")
        .when(F.col("nlp_milli") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    return out.select(
        *df.columns,
        "lm_n_bigrams",
        "lm_lp_micro",
        "ppl",
        "nlp_milli",
        bucket.alias("ppl_bucket"),
    )


def perplexity_filter(
    df: DataFrame,
    lm: dict[str, DataFrame],
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style gate: keep docs whose LM perplexity is at most
    ``max_ppl`` (docs with no scoreable bigram are dropped — a one-word
    page is not trainable prose). Returns ``df``'s columns unchanged."""
    scored = with_perplexity(df, lm, text_col=text_col, id_col=id_col)
    return scored.where(
        F.col("ppl").isNotNull() & (F.col("ppl") <= F.lit(max_ppl))
    ).select(*df.columns)
