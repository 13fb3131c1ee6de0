"""fastText-style document quality classifier, Spark-native: logistic
regression over hashed unigram+bigram bucket counts (the feature map of
``functions/dsir.py``), trained by full-batch gradient descent where each
epoch is ONE distributed aggregation pass — the architecture the public
LLM-data pipelines (CCNet, LLaMA/RedPajama "wikipedia-like" filters) use
for corpus quality gating, minus the C binary.

Determinism is the engineering point. Float gradient sums change with
partitioning (double addition is not associative), so two identical
training runs on different executor counts diverge. Here every per-doc
gradient contribution is quantized to integer micro-units BEFORE the
corpus-wide sum — ``g_doc = floor((σ(z)−y)·Q)`` — and weights live in
integer micro-units updated by exact integer division, so the trained
model is bit-identical under any partitioning/AQE/retry and the whole
training loop replays in SQL (unrolled-CTE oracle, one CTE chain per
epoch).

Scale shape per epoch: the (doc, bucket) count table joins the weight
table (≤ ``m_buckets`` rows — broadcast), one doc-keyed sum produces
scores, one bucket-keyed sum produces gradients. Nothing is collected;
the model ships as a DataFrame and broadcasts at serve time. The
(doc, bucket) table is reused across epochs via ``localCheckpoint`` —
one corpus tokenization total, not one per epoch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edspdf_spark.functions.dsir import _bucket, _ngrams

#: weight / gradient quantum: 1e6 micro-units per unit
W_QUANTUM = 1_000_000


def doc_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 4096,
) -> DataFrame:
    """(id, bucket, c) hashed unigram+bigram counts — the shared feature
    map (one explode + one (doc,bucket)-keyed agg)."""
    return (
        df.select(
            F.col(id_col), F.explode(_ngrams(F.col(text_col))).alias("ng")
        )
        .select(id_col, _bucket(F.col("ng"), m_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _sigma_minus_y_micro(z_micro: Column, y: Column) -> Column:
    """Per-doc quantized residual ``floor((σ(z) − y) · Q)`` ∈
    [−Q, Q]. The only float steps (one exp, one division) happen on
    identical inputs in both engines; quantization BEFORE the corpus sum
    restores exactness."""
    z = z_micro.cast("double") / F.lit(float(W_QUANTUM))
    sigma = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return F.floor((sigma - y.cast("double")) * F.lit(float(W_QUANTUM))).cast(
        "long"
    )


def fit_logreg_hashed(
    train: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 4096,
    epochs: int = 4,
    lr_num: int = 1,
    lr_den: int = 2,
) -> DataFrame:
    """Train the classifier; returns the weight table ``(bucket,
    w_micro)`` (bias rides bucket −1; missing buckets mean weight 0).

    Full-batch GD with integer weights: per epoch each doc's margin
    ``z = Σ c_k·w_k + b`` (exact BIGINT dot product), quantized residual
    ``r = floor((σ(z/Q)−y)·Q)``, gradient ``G_k = Σ_docs r·c_k`` (exact),
    update ``w_k ← w_k − floordiv(lr_num·G_k, lr_den·n_docs)`` — FLOOR
    division (``(a − pmod(a,b)) div b``), not Spark's toward-zero ``div``,
    because gradients go negative and sign-exact agreement with the SQL
    replay matters (DuckDB's ``//`` TRUNCATES on negatives, so the oracle
    subtracts the positive mod first — ``_floordiv_sql``). The learning
    rate is the exact rational ``lr_num/lr_den``.

    Overflow bound: |r| ≤ Q=10⁶ and Σc_k over the corpus must stay under
    2⁶³/Q ≈ 9·10¹² total n-gram occurrences per bucket — at bigger
    corpora raise ``m_buckets`` (hash-uniform buckets split the mass) or
    train on a sampled slice, which is what the reference pipelines do.
    """
    labels = train.select(
        F.col(id_col), F.col(label_col).cast("long").alias("_y")
    )
    # bias as an ordinary feature: bucket −1 with count 1 on every doc —
    # the training loop then has NO special cases and no driver collect
    feats = doc_bucket_counts(train, text_col, id_col, m_buckets).unionByName(
        labels.select(
            id_col,
            F.lit(-1).cast("bigint").alias("bucket"),
            F.lit(1).cast("long").alias("c"),
        )
    )
    feats = feats.localCheckpoint()  # one tokenization, reused per epoch
    n_docs = labels.count()
    spark = train.sparkSession
    # epoch 0 weights: all zero — an empty table IS that state
    weights = spark.createDataFrame([], "bucket bigint, w_micro bigint")
    for _ in range(int(epochs)):
        z = (
            feats.join(F.broadcast(weights), on="bucket", how="left")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.col("c") * F.coalesce(F.col("w_micro"), F.lit(0))
                ).alias("_dot")
            )
        )
        resid = labels.join(z, on=id_col, how="left").select(
            id_col,
            _sigma_minus_y_micro(
                F.coalesce(F.col("_dot"), F.lit(0)), F.col("_y")
            ).alias("_r"),
        )
        grad = (
            feats.join(resid, on=id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("c") * F.col("_r")).alias("_g"))
        )
        den = int(lr_den) * n_docs
        step = F.expr(
            f"(({int(lr_num)} * _g) - pmod({int(lr_num)} * _g, {den})) div {den}"
        )
        weights = (
            grad.join(weights, on="bucket", how="full_outer")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("w_micro"), F.lit(0))
                    - F.coalesce(step, F.lit(0))
                ).alias("w_micro"),
            )
            .localCheckpoint()
        )
    return weights


def predict_logreg(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 4096,
) -> DataFrame:
    """Serve: appends ``lr_z_micro`` (exact BIGINT margin), ``lr_prob``
    (σ of it — one float op on an exact integer) and ``lr_pred``
    (``z ≥ 0``, an integer compare — partitioning-proof). One feature
    pass + a broadcast weight join + one doc-keyed sum."""
    feats = doc_bucket_counts(df, text_col, id_col, m_buckets).unionByName(
        df.select(
            F.col(id_col),
            F.lit(-1).cast("bigint").alias("bucket"),
            F.lit(1).cast("long").alias("c"),
        )
    )
    z = (
        feats.join(F.broadcast(weights), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("w_micro"), F.lit(0))).alias(
                "_dot"
            )
        )
    )
    out = df.join(z, on=id_col, how="left").withColumn(
        "lr_z_micro", F.coalesce(F.col("_dot"), F.lit(0)).cast("long")
    )
    return out.select(
        *df.columns,
        "lr_z_micro",
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(F.col("lr_z_micro").cast("double") / F.lit(float(W_QUANTUM)))
                )
            )
        ).alias("lr_prob"),
        (F.col("lr_z_micro") >= 0).alias("lr_pred"),
    )

def fit_ovr_hashed(
    train: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 4096,
    epochs: int = 4,
    lr_num: int = 1,
    lr_den: int = 2,
) -> DataFrame:
    """fastText-style MULTI-CLASS classifier (e.g. trained language ID)
    as one-vs-rest logistic regression over the same hashed
    unigram+bigram feature map — fastText's softmax differs only in the
    normalizer; OvR keeps every per-class gradient integer-exact so the
    whole multi-class training loop replays in SQL with ``cls`` carried
    as a column through one CTE chain (no per-class unrolling).

    Returns the weight table ``(cls, bucket, w_micro)``; bias rides
    bucket −1 per class. Same integer-GD contract as
    ``fit_logreg_hashed``: residuals quantized to micro-units BEFORE the
    corpus sum, floor-division updates, bit-identical under any
    partitioning/AQE/executor count.

    Scale shape per epoch: the checkpointed (doc, bucket) table joins the
    weight table (≤ n_classes·m_buckets rows — broadcast), one
    (doc, cls)-keyed sum produces margins, one (cls, bucket)-keyed sum
    produces gradients. Every (doc, cls) margin pair exists because the
    bias feature is on every doc and every class's bias weight row exists
    from epoch 0's gradient.
    """
    labels = train.select(
        F.col(id_col), F.col(label_col).cast("string").alias("_cls_true")
    )
    classes = labels.select(F.col("_cls_true").alias("cls")).distinct()
    labx = labels.crossJoin(F.broadcast(classes)).select(
        id_col,
        "cls",
        (F.col("_cls_true") == F.col("cls")).cast("long").alias("_y"),
    )
    feats = doc_bucket_counts(train, text_col, id_col, m_buckets).unionByName(
        labels.select(
            id_col,
            F.lit(-1).cast("bigint").alias("bucket"),
            F.lit(1).cast("long").alias("c"),
        )
    )
    feats = feats.localCheckpoint()
    labx = labx.localCheckpoint()
    n_docs = labels.count()
    spark = train.sparkSession
    weights = spark.createDataFrame(
        [], "cls string, bucket bigint, w_micro bigint"
    )
    for _ in range(int(epochs)):
        z = (
            feats.join(F.broadcast(weights), on="bucket")
            .groupBy(id_col, "cls")
            .agg(F.sum(F.col("c") * F.col("w_micro")).alias("_dot"))
        )
        resid = labx.join(z, on=[id_col, "cls"], how="left").select(
            id_col,
            "cls",
            _sigma_minus_y_micro(
                F.coalesce(F.col("_dot"), F.lit(0)), F.col("_y")
            ).alias("_r"),
        )
        grad = (
            feats.join(resid, on=id_col)
            .groupBy("cls", "bucket")
            .agg(F.sum(F.col("c") * F.col("_r")).alias("_g"))
        )
        den = int(lr_den) * n_docs
        step = F.expr(
            f"(({int(lr_num)} * _g) - pmod({int(lr_num)} * _g, {den})) div {den}"
        )
        weights = (
            grad.join(weights, on=["cls", "bucket"], how="full_outer")
            .select(
                "cls",
                "bucket",
                (
                    F.coalesce(F.col("w_micro"), F.lit(0))
                    - F.coalesce(step, F.lit(0))
                ).alias("w_micro"),
            )
            .localCheckpoint()
        )
    return weights


def predict_ovr(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 4096,
) -> DataFrame:
    """Serve the multi-class head: appends ``ovr_pred`` (argmax class by
    exact BIGINT margin, ties to the lexicographically larger class) and
    ``ovr_z_micro`` (the winning margin). One feature pass + broadcast
    weight join + one (doc, cls)-keyed sum + one doc-keyed struct-max —
    all map-side combinable, no window over the corpus."""
    feats = doc_bucket_counts(df, text_col, id_col, m_buckets).unionByName(
        df.select(
            F.col(id_col),
            F.lit(-1).cast("bigint").alias("bucket"),
            F.lit(1).cast("long").alias("c"),
        )
    )
    z = (
        feats.join(F.broadcast(weights), on="bucket")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("c") * F.col("w_micro")).alias("_dot"))
    )
    best = z.groupBy(id_col).agg(
        F.max(
            F.struct(F.col("_dot").alias("_z"), F.col("cls").alias("_c"))
        ).alias("_b")
    )
    return df.join(best, on=id_col, how="left").select(
        *df.columns,
        F.col("_b._c").alias("ovr_pred"),
        F.col("_b._z").cast("long").alias("ovr_z_micro"),
    )
