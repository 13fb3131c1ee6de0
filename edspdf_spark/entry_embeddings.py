"""Driver queries + DuckDB oracles for the E2-E7 embedding stack.

Every deterministic closed-form component gets a VALUE-LEVEL oracle; the
two NumPy matmul stages (E4 CNN pooler, E6 box transformer) are
deterministic but not SQL-expressible — they ship as rows-only driver
entries with pytest agreement tests instead.

Float-compare strategy: embedding channels are compared as MICRO-UNIT
BIGINTs (``CAST(ROUND(x * 1e6) AS BIGINT)``) concatenated into one string
per row — integer/string equality, no float-hash canonicalization risk.
Both engines use libm sin/cos on identical double inputs (args < 64 here),
which agree far beyond 1e-6.  Literals are emitted with ``repr()`` so both
parsers reconstruct bit-identical doubles; every arithmetic expression is
written with the SAME operation order in Spark and SQL.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edspdf_spark.entry_queries import BLOCS_FROM_LINEITEM_SQL, blocs_from_lineitem
from edspdf_spark.ml.embeddings import (
    MERSENNE,
    WORD_PATTERN,
    _emb_params,
    box_layout_embedding,
    box_transformer_embedding,
    build_vocab,
    cnn_pool_embeddings,
    combine_embeddings,
    page_vectors,
    rescale_bboxes,
    simple_text_embedding,
    simple_text_features,
    sinusoidal_div_terms,
    strided_windows,
)

# shared shapes (small enough that the generated SQL stays readable)
E2_N_POSITIONS = 64
E2_SIZE = 24
E3_EMB_SIZE = 8
HF_WINDOW = 64
HF_STRIDE = 32


def _docs(spark: SparkSession, sf_dir: str, modulo: int) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.filter(F.col("doc_id") % modulo == 0)


def _micro(col):
    return F.round(col * F.lit(1000000.0)).cast("long").cast("string")


def _micro_sql(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 1000000.0) AS BIGINT)"


# ---------------------------------------------------------------------------
# E2 — box layout embedding
# ---------------------------------------------------------------------------


def _e2_channel_sqls(seed: int) -> List[str]:
    """The 24 channel expressions of the E2 embedding in DuckDB SQL,
    mirroring ml/embeddings.box_layout_embedding term by term."""
    n = E2_N_POSITIONS
    d = E2_SIZE // 6
    feats = ["x0", "y0", "x1", "y1", "(x1 - x0)", "((y1 - y0) * 5.0)"]
    first_vec, last_vec = page_vectors(E2_SIZE, seed)
    fp = "(CASE WHEN page_num = 0 THEN 1.0 ELSE 0.0 END)"
    lp = "(CASE WHEN page_num = MAX(page_num) OVER (PARTITION BY url) THEN 1.0 ELSE 0.0 END)"
    out: List[str] = []
    for feat in feats:
        idx = (
            f"GREATEST(LEAST(CAST(TRUNC(({feat}) * {float(n)!r}) AS BIGINT), {n - 1}), 0)"
        )
        for div in sinusoidal_div_terms(d):
            for fn in ("SIN", "COS"):
                ch = len(out)
                out.append(
                    f"{fn}(CAST({idx} AS DOUBLE) * {div!r})"
                    f" + {first_vec[ch]!r} * {fp} + {last_vec[ch]!r} * {lp}"
                )
    return out


def q_box_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — sinusoidal box-layout embedding as pure column expressions."""
    blocs = blocs_from_lineitem(spark, sf_dir)
    out = box_layout_embedding(blocs, E2_N_POSITIONS, E2_SIZE, seed=7)
    sig = F.concat_ws(",", *[_micro(F.col("emb")[i]) for i in range(E2_SIZE)])
    return out.select("url", "page_num", "bloc_ord", sig.alias("emb_sig"))


def box_embedding_oracle() -> str:
    chans = ", ".join(_micro_sql(c) for c in _e2_channel_sqls(seed=7))
    return f"""
WITH blocs AS ({BLOCS_FROM_LINEITEM_SQL})
SELECT url, page_num, bloc_ord,
       array_to_string([{chans}], ',') AS emb_sig
FROM blocs
"""


# ---------------------------------------------------------------------------
# E5 — embedding combiner (sum + cat of two E2 embeddings)
# ---------------------------------------------------------------------------


def q_embedding_combiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — sum and cat of two E2 embeddings (different page-vector seeds),
    via the real ``combine_embeddings`` (zip_with / concat)."""
    blocs = blocs_from_lineitem(spark, sf_dir)
    a = box_layout_embedding(blocs, E2_N_POSITIONS, E2_SIZE, seed=7, out_col="ea")
    b = box_layout_embedding(a, E2_N_POSITIONS, E2_SIZE, seed=21, out_col="eb")
    summed = combine_embeddings([F.col("ea"), F.col("eb")], "sum")
    catted = combine_embeddings([F.col("ea"), F.col("eb")], "cat")
    out = b.withColumn("es", summed).withColumn("ec", catted)
    sum_sig = F.concat_ws(",", *[_micro(F.col("es")[i]) for i in range(E2_SIZE)])
    cat_sig = F.concat_ws(",", *[_micro(F.col("ec")[i]) for i in range(2 * E2_SIZE)])
    return out.select(
        "url", "page_num", "bloc_ord", sum_sig.alias("sum_sig"), cat_sig.alias("cat_sig")
    )


def embedding_combiner_oracle() -> str:
    a = _e2_channel_sqls(seed=7)
    b = _e2_channel_sqls(seed=21)
    sum_chans = ", ".join(_micro_sql(f"({x}) + ({y})") for x, y in zip(a, b))
    cat_chans = ", ".join(_micro_sql(c) for c in [*a, *b])
    return f"""
WITH blocs AS ({BLOCS_FROM_LINEITEM_SQL})
SELECT url, page_num, bloc_ord,
       array_to_string([{sum_chans}], ',') AS sum_sig,
       array_to_string([{cat_chans}], ',') AS cat_sig
FROM blocs
"""


# ---------------------------------------------------------------------------
# E3 — text features / vocab / hash embedding
# ---------------------------------------------------------------------------

_TOKS_CTE = f"""
toks AS (
  SELECT doc_id, i - 1 AS tok_idx, tk[i] AS tok, cnt
  FROM (
    SELECT doc_id, regexp_extract_all(text, '{WORD_PATTERN}') AS tk,
           len(regexp_extract_all(text, '{WORD_PATTERN}')) AS cnt
    FROM documents WHERE doc_id % {{modulo}} = 0
  ), UNNEST(generate_series(1, cnt)) AS t(i)
)"""

_SHAPE_SQL = (
    "CASE WHEN length(tok) >= 100 THEN 'LONG' ELSE "
    "regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace("
    "tok, '[a-z]', 'x', 'g'), '[A-Z]', 'X', 'g'), '[0-9]', 'd', 'g'),"
    " 'x{5,}', 'xxxx', 'g'), 'X{5,}', 'XXXX', 'g'), 'd{5,}', 'dddd', 'g') END"
)


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 features — tokenizer + word_shape + affixes as JVM expressions."""
    docs = _docs(spark, sf_dir, 20).select("doc_id", "text")
    return simple_text_features(docs, "text", keep_cols=("doc_id",)).select(
        "doc_id", "tok_idx", "tok", "shape", "prefix", "suffix", "norm"
    )


def text_features_oracle() -> str:
    cte = _TOKS_CTE.replace("{modulo}", "20")
    return f"""
WITH {cte}
SELECT doc_id, tok_idx, tok, {_SHAPE_SQL} AS shape,
       substring(lower(tok), 1, 3) AS prefix,
       right(lower(tok), 3) AS suffix,
       lower(tok) AS norm
FROM toks
"""


def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 vocabulary — distributed sorted-distinct ids ('__unk__' = 0)."""
    docs = _docs(spark, sf_dir, 10).select("doc_id", "text")
    feats = simple_text_features(docs, "text", keep_cols=("doc_id",))
    return build_vocab(feats, "norm")


def text_vocab_oracle() -> str:
    cte = _TOKS_CTE.replace("{modulo}", "10")
    return f"""
WITH {cte}
SELECT '__unk__' AS value, 0 AS id
UNION ALL
SELECT value, CAST(DENSE_RANK() OVER (ORDER BY value) AS INT) AS id
FROM (SELECT DISTINCT lower(tok) AS value FROM toks)
"""


_HASH_FOLD = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_filter(string_split({s}, ''), c -> c != ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % {m})"
)


def _hash_vec_sqls(feature_sql: str, salt: int) -> List[str]:
    h = _HASH_FOLD.format(s=feature_sql, m=MERSENNE)
    out = []
    for a, b in _emb_params(E3_EMB_SIZE, salt):
        out.append(
            f"CAST((({h}) * {a} + {b}) % {MERSENNE} AS DOUBLE)"
            f" / {float(MERSENNE)!r} * 2.0 - 1.0"
        )
    return out


def q_text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 forward — shape+prefix+suffix hash vectors summed per token
    (norm excluded, mirroring the reference's commented-out term)."""
    docs = _docs(spark, sf_dir, 50).select("doc_id", "text")
    feats = simple_text_features(docs, "text", keep_cols=("doc_id",))
    emb = simple_text_embedding(feats, size=E3_EMB_SIZE)
    sig = F.concat_ws(",", *[_micro(F.col("emb")[i]) for i in range(E3_EMB_SIZE)])
    return emb.select("doc_id", "tok_idx", "tok", sig.alias("emb_sig"))


def text_hash_embedding_oracle() -> str:
    cte = _TOKS_CTE.replace("{modulo}", "50")
    shape_v = _hash_vec_sqls(_SHAPE_SQL, salt=1)
    prefix_v = _hash_vec_sqls("substring(lower(tok), 1, 3)", salt=2)
    suffix_v = _hash_vec_sqls("right(lower(tok), 3)", salt=3)
    chans = ", ".join(
        _micro_sql(f"({s}) + ({p}) + ({u})")
        for s, p, u in zip(shape_v, prefix_v, suffix_v)
    )
    return f"""
WITH {cte}
SELECT doc_id, tok_idx, tok, array_to_string([{chans}], ',') AS emb_sig
FROM toks
"""


# ---------------------------------------------------------------------------
# E7 — strided windows + LayoutLM bbox rescale
# ---------------------------------------------------------------------------


def q_hf_windowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 windowing — strided token windows, best occurrence per token by
    contextualization score (ties → later window)."""
    docs = _docs(spark, sf_dir, 20).select("doc_id", "text")
    toks = simple_text_features(docs, "text", keep_cols=("doc_id",)).select(
        "doc_id", "tok_idx"
    )
    return strided_windows(
        toks, page_cols=("doc_id",), window=HF_WINDOW, stride=HF_STRIDE
    )


def hf_windowing_oracle() -> str:
    W, S = HF_WINDOW, HF_STRIDE
    cte = _TOKS_CTE.replace("{modulo}", "20")
    return f"""
WITH {cte},
base AS (
  SELECT doc_id, tok_idx, cnt AS n_int,
         1 + GREATEST(0, CAST(CEIL(CAST(cnt - {W} AS DOUBLE) / {float(S)!r}) AS INT)) AS n_win
  FROM toks
),
cand AS (
  SELECT b.doc_id, b.tok_idx, b.n_int, u.win
  FROM base b, UNNEST(generate_series(
    GREATEST(CAST(0 AS BIGINT), CAST(CEIL(CAST(b.tok_idx - {W} + 1 AS DOUBLE) / {float(S)!r}) AS BIGINT)),
    LEAST(CAST(FLOOR(b.tok_idx / {float(S)!r}) AS BIGINT), CAST(b.n_win - 1 AS BIGINT))
  )) AS u(win)
),
scored AS (
  SELECT doc_id, tok_idx, win,
    GREATEST(LEAST(tok_idx - win * {S} + 1,
                   (2 + LEAST({W}, n_int - win * {S})) - 1 - (tok_idx - win * {S} + 1)),
             0) AS score
  FROM cand
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id, tok_idx ORDER BY score DESC, win DESC) AS rn
  FROM scored
)
SELECT doc_id, tok_idx, CAST(win AS INT) AS best_window, CAST(score AS INT) AS score
FROM ranked WHERE rn = 1
"""


def q_layoutlm_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 bbox plumbing — sequential 1000-unit page rescale + integer
    (truncating) bbox quantization."""
    blocs = blocs_from_lineitem(spark, sf_dir)
    dims = blocs.withColumn(
        "page_width", F.lit(400.0) + (F.col("bloc_ord") % 50) * F.lit(20.0)
    ).withColumn(
        "page_height", F.lit(300.0) + (F.col("bloc_ord") % 61) * F.lit(15.0)
    )
    out = rescale_bboxes(dims)
    return out.select("url", "page_num", "bloc_ord", "bb_x0", "bb_y0", "bb_x1", "bb_y1")


def layoutlm_bbox_oracle() -> str:
    ratio = "((400.0 + (bloc_ord % 50) * 20.0) / (300.0 + (bloc_ord % 61) * 15.0))"
    w0 = "(400.0 + (bloc_ord % 50) * 20.0)"
    h0 = "(300.0 + (bloc_ord % 61) * 15.0)"
    w1 = f"(CASE WHEN {w0} > 1000 THEN 1000.0 ELSE {w0} END)"
    h1 = f"(CASE WHEN {w0} > 1000 THEN 1000.0 / {ratio} ELSE {h0} END)"
    w2 = f"(CASE WHEN {h1} > 1000 THEN 1000.0 * {ratio} ELSE {w1} END)"
    h2 = f"(CASE WHEN {h1} > 1000 THEN 1000.0 ELSE {h1} END)"
    return f"""
WITH blocs AS ({BLOCS_FROM_LINEITEM_SQL})
SELECT url, page_num, bloc_ord,
       CAST(TRUNC(x0 * {w2}) AS BIGINT) AS bb_x0,
       CAST(TRUNC(y0 * {h2}) AS BIGINT) AS bb_y0,
       CAST(TRUNC(x1 * {w2}) AS BIGINT) AS bb_x1,
       CAST(TRUNC(y1 * {h2}) AS BIGINT) AS bb_y1
FROM blocs
"""


# ---------------------------------------------------------------------------
# E4 / E6 — deterministic NumPy stages (rows-only driver checks)
# ---------------------------------------------------------------------------


def q_line_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 line pooling — max over each doc's token embeddings (max is
    order-independent, so the oracle compare is float-order-proof)."""
    from edspdf_spark.ml.embeddings import pool_line_embeddings

    docs = _docs(spark, sf_dir, 50).select("doc_id", "text")
    feats = simple_text_features(docs, "text", keep_cols=("doc_id",))
    emb = simple_text_embedding(feats, size=E3_EMB_SIZE)
    pooled = pool_line_embeddings(emb, line_cols=("doc_id",), mode="max")
    sig = F.concat_ws(",", *[_micro(F.col("emb")[i]) for i in range(E3_EMB_SIZE)])
    return pooled.select("doc_id", sig.alias("emb_sig"))


def line_pooling_oracle() -> str:
    cte = _TOKS_CTE.replace("{modulo}", "50")
    shape_v = _hash_vec_sqls(_SHAPE_SQL, salt=1)
    prefix_v = _hash_vec_sqls("substring(lower(tok), 1, 3)", salt=2)
    suffix_v = _hash_vec_sqls("right(lower(tok), 3)", salt=3)
    maxes = ", ".join(
        _micro_sql(f"MAX(({s}) + ({p}) + ({u}))")
        for s, p, u in zip(shape_v, prefix_v, suffix_v)
    )
    return f"""
WITH {cte}
SELECT doc_id, array_to_string([{maxes}], ',') AS emb_sig
FROM toks GROUP BY doc_id
"""


def q_cnn_pooled_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — hash token embeddings pooled per doc through the seeded
    multi-kernel CNN (deterministic; NumPy matmuls, not SQL)."""
    docs = _docs(spark, sf_dir, 50).select("doc_id", "text")
    feats = simple_text_features(docs, "text", keep_cols=("doc_id",))
    emb = simple_text_embedding(feats, size=16)
    pooled = cnn_pool_embeddings(
        emb, group_cols=("doc_id",), in_dim=16, out_channels=16, output_size=16
    )
    sig = F.concat_ws(",", F.transform(F.col("emb"), lambda x: _micro(x)))
    return pooled.select("doc_id", sig.alias("emb_sig"))


def q_box_transformer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — per-page relative-attention contextualization of the E2
    embeddings (deterministic; NumPy matmuls, not SQL)."""
    blocs = blocs_from_lineitem(spark, sf_dir).filter(
        F.col("url").cast("long") % 37 == 0
    )
    withemb = box_layout_embedding(blocs, E2_N_POSITIONS, E2_SIZE, seed=7)
    out = box_transformer_embedding(withemb, dim=E2_SIZE, n_heads=4, n_layers=1)
    sig = F.concat_ws(",", F.transform(F.col("emb"), lambda x: _micro(x)))
    return out.select("url", "page_num", "bloc_ord", sig.alias("emb_sig"))
