"""Similarity search over embedding columns (``array<float>``).

Three paths:

* ``cosine_topk`` — brute-force exact top-k. The query side is collected to
  a (small) NumPy matrix and closed over by an Arrow-batched ``mapInPandas``
  stage that does one BLAS matmul per batch, keeps a PARTITION-LOCAL top-k,
  and only then shuffles k rows per (query × partition) for the global
  top-k. Driver never sees the corpus.
* ``lsh_ann_topk`` — random-hyperplane LSH: bucket by sign bits, search only
  within the query's bucket (+ optional multi-probe). The scale path: the
  candidate set per query is corpus/2^bits on average.
* ``ivf_ann_topk`` — IVF (inverted-file) ANN: a seeded NumPy k-means coarse
  quantizer trained on a driver-side sample assigns every vector to its
  nearest centroid cell; each query searches only its ``nprobe`` nearest
  cells. The cell id is the shuffle/partition key — at 10^12 vectors each
  cell is an independently scannable slice, and recall/cost trades off via
  ``nprobe``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


#: Hard cap on query vectors collected to the driver by :func:`cosine_topk`.
#: The corpus side never touches the driver; the query side must stay a
#: broadcast-sized matrix (dim 64 × 1e5 ≈ 50 MB float64).
MAX_QUERY_ROWS = 100_000


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    The query side is collected to the driver with a hard ``max_queries``
    bound (raises rather than silently OOM-ing at scale); for huge query
    sets, chunk the queries or use :func:`lsh_ann_topk`/:func:`ivf_ann_topk`.
    """
    # id columns keep their native Spark type (long OR string — _id_type
    # discipline): coercing to int64 crashed on string document keys
    topk_schema = (
        f"query_id {_id_type(queries, query_id_col)},"
        f" vec_id {_id_type(corpus, id_col)}, cosine double"
    )
    q_rows = queries.select(query_id_col, query_vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk collects the query side to the driver; got more than "
            f"{max_queries} query rows — chunk the queries or use the ANN paths"
        )
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {_id_type(queries, query_id_col)}, rank int,"
            f" vec_id {_id_type(corpus, id_col)}, cosine double",
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = _normalize(np.array([r[1] for r in q_rows], dtype=np.float64))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            mat = _normalize(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            sims = q_mat @ mat.T  # (n_q, n_batch)
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = {
                "query_id": np.repeat(q_ids, kk),
                "vec_id": ids[top].ravel(),
                "cosine": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            yield pd.DataFrame(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(score, schema=topk_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    ``cos(a, b) > threshold`` and ``id_a < id_b``.

    Expression-based (left-associated ``element_at`` sums, never BLAS) so
    the cosine is bit-identical to a sequential-SQL oracle — this is the
    EXACTNESS BASELINE, O(n²) by definition, and it broadcasts the corpus:
    ``max_rows`` hard-caps the input and RAISES on overflow (the same
    contract as ``cosine_topk.max_queries``) so it can never be pointed at
    a real corpus by accident. The production near-dup path is
    :func:`lsh_neardup_pairs`, which generates candidates within LSH sign
    buckets and rescores only those with this same exact kernel.
    """
    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_neardup_pairs is the O(n²) exactness baseline and got "
            f"{n} rows (max_rows={max_rows}); use lsh_neardup_pairs for "
            "corpus-scale near-dup detection"
        )
    head = corpus.select(vec_col).head(1)
    if not head:
        t = _id_type(corpus, id_col)
        return corpus.sparkSession.createDataFrame(
            [], f"id_a {t}, id_b {t}, cos double"
        )
    dim = len(head[0][0])
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"))
    joined = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))

    cos = _cos_expr("emb_a", "emb_b", dim)
    return (
        joined.withColumn("cos", cos)
        .filter(F.col("cos") > F.lit(float(threshold)))
        .select("id_a", "id_b", "cos")
    )


def kmeans_fit(
    sample: np.ndarray, n_cells: int, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """Seeded Lloyd k-means on L2-normalized vectors (spherical-ish) —
    the IVF coarse quantizer. Deterministic; pure NumPy."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    centroids = sample[idx].copy()
    for _ in range(n_iter):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def _assign_cells(df: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str):
    """vec → nearest-centroid cell id, Arrow-batched matmul."""
    schema = f"vid {_id_type(df, id_col)}, cell int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col].to_numpy(),
                    "cell": (mat @ centroids.T).argmax(axis=1).astype(np.int32),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    sample_fraction: float = 1.0,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_sample_rows: int = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF index built on the fly.

    Train: k-means on a BOUNDED driver-side sample — ``sample_fraction``
    thins first, then ``max_sample_rows`` (default ``max(n_cells * 256,
    20_000)``) hard-caps the collected rows, so at 10^12 vectors the
    quantizer still trains on tens of thousands of rows, never the corpus.
    Serve: corpus vectors tagged with their cell; each query expands to its
    ``nprobe`` nearest cells and joins corpus rows on the cell id, exact
    cosine within the candidate set, window top-k. Higher ``nprobe`` →
    higher recall.
    """
    if max_sample_rows is None:
        max_sample_rows = max(n_cells * 256, 20_000)
    samp = corpus.select(id_col, vec_col)
    if sample_fraction < 1.0:
        samp = samp.sample(fraction=sample_fraction, seed=seed)
    # ordered limit (distributed top-k, not a full sort) — a bare limit
    # takes whichever partitions answer first, making the trained quantizer
    # (and thus every cell assignment) vary run to run
    sample = np.array(
        [
            np.asarray(r[1], dtype=np.float64)
            for r in samp.orderBy(id_col).limit(int(max_sample_rows)).collect()
        ]
    )
    if not len(sample):
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {_id_type(queries, id_col)}, rank int,"
            f" vec_id {_id_type(corpus, id_col)}, cosine double",
        )
    centroids = kmeans_fit(sample, n_cells, seed=seed)

    c_cells = _assign_cells(corpus, centroids, id_col, vec_col)
    c = corpus.join(c_cells, F.col(id_col) == F.col("vid")).drop("vid").alias("c")

    # query side: nprobe nearest cells per query → explode
    probe_schema = f"query_id {_id_type(queries, id_col)}, cell int"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            sims = mat @ centroids.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, top.shape[1]),
                    "cell": top.ravel().astype(np.int32),
                }
            )

    q_probes = queries.select(id_col, vec_col).mapInPandas(probe, schema=probe_schema)
    q = (
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("q_emb")
        )
        .join(q_probes, F.col("qid") == F.col("query_id"))
        .select("query_id", "q_emb", "cell")
        .alias("q")
    )

    cand = q.join(c, on="cell")
    score_schema = (
        f"query_id {_id_type(queries, id_col)},"
        f" vec_id {_id_type(corpus, id_col)}, cosine double"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            qm = _normalize(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf["q_emb"]])
            )
            cm = _normalize(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "vec_id": pdf[id_col].to_numpy(),
                    "cosine": (qm * cm).sum(axis=1),
                }
            )

    scored = cand.select("query_id", "q_emb", id_col, vec_col).mapInPandas(
        score, schema=score_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _cos_expr(a_col: str, b_col: str, dim: int):
    """Cosine as pure Catalyst expressions with left-assoc sums — the SAME
    operation order as the DuckDB oracle, so rankings are bit-identical.

    Implemented as a ``zip_with`` + ``aggregate`` fold rather than a
    per-dimension unrolled expression: the fold performs the exact same
    sequence of double additions (``((0.0 + t1) + t2) + …`` per
    component, each addition order-identical to DuckDB's
    ``list_reduce``), but the generated Java stays O(1) in ``dim``. The
    unrolled form at dim=64 inside a broadcast-join whole-stage produced
    a >10k-line generated class that janino refused to compile, dropping
    the whole stage to interpreted mode."""
    a = F.slice(F.col(a_col), 1, dim)
    b = F.slice(F.col(b_col), 1, dim)
    pairs = F.zip_with(
        a,
        b,
        lambda x, y: F.struct(
            x.cast("double").alias("a"), y.cast("double").alias("b")
        ),
    )
    acc = F.aggregate(
        pairs,
        F.struct(
            F.lit(0.0).alias("dot"),
            F.lit(0.0).alias("na"),
            F.lit(0.0).alias("nb"),
        ),
        lambda s, p: F.struct(
            (s["dot"] + p["a"] * p["b"]).alias("dot"),
            (s["na"] + p["a"] * p["a"]).alias("na"),
            (s["nb"] + p["b"] * p["b"]).alias("nb"),
        ),
    )
    return acc["dot"] / (F.sqrt(acc["na"]) * F.sqrt(acc["nb"]))


def ivf_serve_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = None,
) -> DataFrame:
    """IVF serve half with a GIVEN coarse quantizer.

    ``centroids``: small DataFrame ``(cid int, c_emb array)`` — e.g. the
    output of :func:`kmeans_fit` registered as a DataFrame, or any
    deterministic codebook. Serve plan, zero Python:

    * cell assignment — corpus × broadcast(centroids) cosine, argmax via
      ``max_by`` groupBy (partial-aggregatable map-side combine, NOT a
      window sort over the corpus);
    * query probes — top-``nprobe`` cells per query (windowed, query side
      is small);
    * candidates — probe⨝cell equi-join, exact in-cell cosine, window
      top-``k``.

    All scores are left-assoc expression sums (``_cos_expr``) so the
    DuckDB oracle ranks bit-identically. The trained twin
    (:func:`ivf_ann_topk`) swaps in k-means centroids + BLAS scoring.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])

    cent = F.broadcast(centroids.select("cid", "c_emb"))

    # corpus → (vec_id, embedding, cell): argmax cosine, ties → lowest cid
    # (np.argmax first-max semantics)
    cells = (
        corpus.select(id_col, vec_col)
        .crossJoin(cent)
        .withColumn("sim", _cos_expr(vec_col, "c_emb", dim))
        .groupBy(id_col)
        .agg(
            F.max_by("cid", F.struct(F.col("sim"), -F.col("cid"))).alias("cell"),
            F.first(vec_col).alias(vec_col),
        )
    )

    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cid").asc())
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"))
        .crossJoin(cent)
        .withColumn("sim", _cos_expr("q_emb", "c_emb", dim))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", F.col("cid").alias("cell"))
    )

    cand = probes.join(cells, on="cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cand.withColumn("cosine", _cos_expr("q_emb", vec_col, dim))
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col)
    )


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_bits, dim))


def _id_type(df: DataFrame, id_col: str) -> str:
    """The id column's Spark type — empty-result schemas must match the
    non-empty path, not assume ``long``."""
    return dict(df.dtypes)[id_col]


def _sign_bucket(vec_col: str, H: np.ndarray, n_bits: int):
    """Random-hyperplane sign-bit bucket id as a column expression (same
    arithmetic shape as the SQL oracle: left-associated element sums).

    Each per-bit dot product is a ``zip_with`` + ``aggregate`` fold over a
    single array *literal* of the hyperplane row — the same left-assoc
    double additions as the old unrolled form (float element × double
    literal promotes the element to double in both), but the generated
    Java stays O(n_bits) instead of O(n_bits × dim): the unrolled form at
    6 bits × 64 dims inside an explode stage produced a generated class
    janino refused to compile, dropping the stage to interpreted mode."""
    sign_bits = F.lit(0).cast("long")
    for b in range(n_bits):
        hb = F.lit([float(x) for x in H[b]])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), hb, lambda x, h: x.cast("double") * h
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        sign_bits = sign_bits + F.when(dot > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sign_bits


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_bits: int = 6,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 10_000,
    vectorized: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs AT SCALE: candidates from
    random-hyperplane sign buckets (``n_tables`` independent tables boost
    recall), then exact cosine rescoring — the same bit-identical
    expression kernel as :func:`cosine_neardup_pairs` — within candidates
    only.

    ``vectorized=True`` (production default) computes the sign buckets and
    the rescore as Arrow-batched NumPy matvecs — the 768-term bucket
    expression and 192-term cosine expression overflow whole-stage
    codegen's 64KB method limit and fall back to interpreted eval, costing
    ~10 s of fixed plan/compile/interpret overhead per run.
    ``vectorized=False`` keeps the pure-expression twin whose arithmetic
    is left-assoc-identical to the DuckDB oracle;
    tests/test_functions.py asserts both paths emit the SAME pairs (they
    diverge only if a dot product sits within ~1e-15 of a sign/threshold
    boundary).

    This replaces the O(n²) cross join of the exact baseline: candidate
    volume is Σ_buckets |bucket|²/2 per table, i.e. ~n²/2^bits on a
    balanced table — the bucket id is the shuffle key, so at 10^12 vectors
    each bucket is an independent slice. A true near-dup pair is missed
    only if it disagrees on ≥1 bit in EVERY table; misses decay
    exponentially with ``n_tables``.
    """
    head = corpus.select(vec_col).head(1)
    if not head:
        t = _id_type(corpus, id_col)
        return corpus.sparkSession.createDataFrame(
            [], f"id_a {t}, id_b {t}, cos double"
        )
    dim = len(head[0][0])

    if vectorized:
        H = np.stack([hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)])
        pows = (1 << np.arange(n_bits)).astype(np.int64)
        id_t = _id_type(corpus, id_col)

        def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                ids = pdf[id_col].to_numpy()
                out_ids = np.repeat(ids, n_tables)
                tables = np.tile(np.arange(n_tables), len(pdf))
                # (n, tables, bits) sign bits → integer bucket ids
                dots = np.einsum("nd,tbd->ntb", mat, H)
                bks = ((dots > 0) @ pows).reshape(-1)
                yield pd.DataFrame(
                    {id_col: out_ids, "table": tables, "bucket": bks}
                )

        tagged = corpus.select(id_col, vec_col).mapInPandas(
            tag, schema=f"{id_col} {id_t}, table int, bucket long"
        )
    else:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    _sign_bucket(
                        vec_col, hyperplanes(dim, n_bits, seed + t), n_bits
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        tagged = corpus.select(
            F.col(id_col), F.explode(buckets).alias("tb")
        ).select(
            id_col, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
        )

    # ONE scan + ONE bucket-keyed shuffle: collect each bucket's sorted id
    # list and expand pairs with array HOFs. (A bucket SELF-JOIN evaluates
    # the 768-term sign expressions twice — Catalyst does not reuse the
    # exchange across self-join sides, measured on the minhash path.)
    # Buckets above max_bucket_size are dropped like lsh_candidate_pairs'
    # hot-bucket cap — a degenerate bucket cannot go quadratic.
    bucketed = tagged.groupBy("table", "bucket").agg(
        F.array_sort(F.collect_list(F.col(id_col))).alias("_ids")
    )
    bucketed = bucketed.filter(
        (F.size("_ids") >= 2) & (F.size("_ids") <= int(max_bucket_size))
    )
    pair_arrays = F.filter(
        F.flatten(
            F.transform(
                F.col("_ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    cand = (
        bucketed.select(F.explode(pair_arrays).alias("_p"))
        .select(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .distinct()
    )

    ea = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"))
    eb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"))
    scored = cand.join(ea, "id_a").join(eb, "id_b")

    if vectorized:
        thr = float(threshold)

        def rescore(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                a = _normalize(
                    np.array([np.asarray(v, dtype=np.float64) for v in pdf["emb_a"]])
                )
                b = _normalize(
                    np.array([np.asarray(v, dtype=np.float64) for v in pdf["emb_b"]])
                )
                cosv = (a * b).sum(axis=1)
                keep = cosv > thr
                yield pd.DataFrame(
                    {
                        "id_a": pdf["id_a"].to_numpy()[keep],
                        "id_b": pdf["id_b"].to_numpy()[keep],
                        "cos": cosv[keep],
                    }
                )

        id_t = _id_type(corpus, id_col)
        return scored.mapInPandas(
            rescore, schema=f"id_a {id_t}, id_b {id_t}, cos double"
        )

    cos = _cos_expr("emb_a", "emb_b", dim)
    return (
        scored.withColumn("cos", cos)
        .filter(F.col("cos") > F.lit(float(threshold)))
        .select("id_a", "id_b", "cos")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign bucket, exact search within
    the bucket. Recall grows with fewer bits / multi-probe; this is the
    pattern that scales to 10^12 vectors (bucket = shuffle key)."""
    head = corpus.select(vec_col).head(1)
    if not head:
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {_id_type(queries, id_col)}, rank int,"
            f" vec_id {_id_type(corpus, id_col)}, cosine double",
        )
    dim = len(head[0][0])
    H = hyperplanes(dim, n_bits, seed)
    sign_bits = _sign_bucket(vec_col, H, n_bits)

    c = corpus.withColumn("bucket", sign_bits).alias("c")
    q = queries.withColumn("bucket", sign_bits).alias("q")

    joined = q.join(c, on=F.col("q.bucket") == F.col("c.bucket")).select(
        F.col(f"q.{id_col}").alias("query_id"),
        F.col(f"c.{id_col}").alias("vec_id"),
        _cos_expr(f"c.{vec_col}", f"q.{vec_col}", dim).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def semdedup_verdicts(
    corpus: DataFrame,
    centroids: DataFrame,
    eps: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = None,
    persist_cells: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) keep/drop verdicts
    with a GIVEN codebook — the semantic near-duplicate pruner used on
    LAION/C4-scale corpora.

    Semantics (the paper's released triangular implementation, not
    connected components): every vector is assigned to its nearest
    centroid cell (argmax cosine, ties -> lowest ``cid``); within a cell,
    vectors are ranked by *retention priority* — ascending similarity to
    the cell centroid (the paper keeps the example FARTHEST from the
    centroid), ties -> lowest id. A vector is DROPPED iff some
    higher-priority vector in the same cell has cosine ``>= 1 - eps``
    with it.

    Plan shape (zero Python, pure Catalyst):

    * cell assignment — corpus × broadcast(centroids) cosine, ``max_by``
      groupBy argmax (partial-aggregatable, no window over the corpus);
    * in-cell pairs — one self equi-join on the cell id (the shuffle
      key; cell sizes are the scale control — pick ``n_cells`` so the
      mean cell is O(corpus / n_cells), exactly the paper's regime of
      ~50k clusters for LAION) with the priority predicate folded into
      the join condition so only the triangular half materializes. A
      sort-merge join on the cell key STREAMS cell members instead of
      materializing a per-cell array, which is why this beats a
      collect_list pair expansion here: at 768-dim embeddings a 10^5-row
      cell as one array row would be ~0.6 GB;
    * verdict — left anti semantics via a distinct-dropped left join.

    ``persist_cells=True`` (default) persists the assignment frame —
    Catalyst does not reuse exchanges across self-join sides, so without
    it the broadcast-assign + argmax aggregation runs three times (both
    pair sides + the verdict spine). The persisted frame is exactly the
    "cluster assignment" artifact production IVF/SemDeDup systems write
    out anyway; callers managing their own lifecycle can pass False and
    checkpoint/write it themselves.

    All cosines are left-assoc expression sums (:func:`_cos_expr`) so a
    DuckDB oracle ranks and thresholds bit-identically.

    ``centroids``: small DataFrame ``(cid int, c_emb array)`` — e.g.
    :func:`kmeans_fit` output or any deterministic codebook.
    Returns ``(vec_id, cell, cent_sim, keep)`` for every corpus row.
    """
    if dim is None:
        head = corpus.select(vec_col).head(1)
        if not head:
            return corpus.sparkSession.createDataFrame(
                [],
                f"{id_col} {_id_type(corpus, id_col)}, cell int,"
                " cent_sim double, keep boolean",
            )
        dim = len(head[0][0])

    cent = F.broadcast(centroids.select("cid", "c_emb"))

    # (vec_id, embedding, cell, cent_sim): argmax cosine over the codebook,
    # ties -> lowest cid (np.argmax first-max semantics, as in ivf_serve_topk)
    cells = (
        corpus.select(id_col, vec_col)
        .crossJoin(cent)
        .withColumn("sim", _cos_expr(vec_col, "c_emb", dim))
        .groupBy(id_col)
        .agg(
            F.max_by("cid", F.struct(F.col("sim"), -F.col("cid"))).alias("cell"),
            F.max(F.struct(F.col("sim"), -F.col("cid"))).getField("sim").alias(
                "cent_sim"
            ),
            F.first(vec_col).alias(vec_col),
        )
    )
    if persist_cells:
        cells = cells.persist()

    u = cells.alias("u")
    v = cells.alias("v")
    # triangular: u strictly higher retention priority than v
    priority = (F.col("u.cent_sim") < F.col("v.cent_sim")) | (
        (F.col("u.cent_sim") == F.col("v.cent_sim"))
        & (F.col(f"u.{id_col}") < F.col(f"v.{id_col}"))
    )
    pair_cos = _cos_expr(f"u.{vec_col}", f"v.{vec_col}", dim)
    dropped = (
        v.join(u, on=(F.col("u.cell") == F.col("v.cell")) & priority)
        .filter(pair_cos >= F.lit(1.0 - float(eps)))
        .select(F.col(f"v.{id_col}").alias("_dropped_id"))
        .distinct()
    )

    return (
        cells.join(
            dropped, on=F.col(id_col) == F.col("_dropped_id"), how="left"
        )
        .select(
            id_col,
            "cell",
            "cent_sim",
            F.col("_dropped_id").isNull().alias("keep"),
        )
    )


def semdedup(
    corpus: DataFrame,
    n_cells: int = 16,
    eps: float = 0.05,
    seed: int = 42,
    sample_fraction: float = 1.0,
    max_sample_rows: int = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Trained twin of :func:`semdedup_verdicts`: fit the codebook with
    seeded k-means on a BOUNDED driver-side sample (same guard rails as
    :func:`ivf_ann_topk` — ``sample_fraction`` thins, ``max_sample_rows``
    hard-caps, ordered limit for run-to-run determinism), then prune.
    Returns the same ``(vec_id, cell, cent_sim, keep)`` verdict frame.
    ``vectorized=True`` (default — the production path) prunes via the
    Arrow/BLAS twin; ``False`` uses the oracle-exact expression twin."""
    if max_sample_rows is None:
        max_sample_rows = max(n_cells * 256, 20_000)
    samp = corpus.select(id_col, vec_col)
    if sample_fraction < 1.0:
        samp = samp.sample(fraction=sample_fraction, seed=seed)
    sample = np.array(
        [
            np.asarray(r[1], dtype=np.float64)
            for r in samp.orderBy(id_col).limit(int(max_sample_rows)).collect()
        ]
    )
    if not len(sample):
        return corpus.sparkSession.createDataFrame(
            [],
            f"{id_col} {_id_type(corpus, id_col)}, cell int,"
            " cent_sim double, keep boolean",
        )
    centroids = kmeans_fit(sample, n_cells, seed=seed)
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, c_emb array<double>",
    )
    if vectorized:
        return semdedup_verdicts_vec(
            corpus, cent_df, eps=eps, id_col=id_col, vec_col=vec_col
        )
    return semdedup_verdicts(
        corpus, cent_df, eps=eps, id_col=id_col, vec_col=vec_col,
        dim=int(centroids.shape[1]),
    )


def semdedup_verdicts_vec(
    corpus: DataFrame,
    centroids: DataFrame,
    eps: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/BLAS production twin of :func:`semdedup_verdicts` — same
    verdicts, vectorized execution (parity-asserted in
    tests/test_functions.py).

    The expression twin exists for the bit-exact DuckDB oracle, but a
    dim-d cosine as Catalyst expressions is 3·d adds/multiplies per pair
    evaluated row-at-a-time once the generated method blows the janino
    64KB limit (observed at dim 64; certain at the paper's dim 768). This
    twin keeps the identical plan shape — broadcast codebook, one
    cell-keyed exchange, streaming triangular scan — but does the math as
    two BLAS matmuls per Arrow batch:

    * assignment — ``sims = M @ C.T`` per batch (codebook closed over,
      it's tiny), cell = row argmax (first-max tie = lowest cid);
    * prune — ``repartition(cell) → sortWithinPartitions(cell,
      cent_sim, id)`` so each cell arrives contiguous and already in
      retention-priority order, then per cell ``G = N @ N.T`` and row i
      drops iff ``any(G[j, i] >= 1-eps, j < i)`` — the paper's exact
      triangular implementation.

    Per-task memory is O(cell_rows · dim) for the group matrix — the
    same bound the sort-merge join pays for a sorted cell run, and the
    reason ``n_cells`` must grow with the corpus (as in the paper).
    """
    head = corpus.select(vec_col).head(1)
    if not head:
        return corpus.sparkSession.createDataFrame(
            [],
            f"{id_col} {_id_type(corpus, id_col)}, cell int,"
            " cent_sim double, keep boolean",
        )
    cent_rows = sorted(centroids.select("cid", "c_emb").collect())
    C = _normalize(np.array([r[1] for r in cent_rows], dtype=np.float64))
    cids = np.array([int(r[0]) for r in cent_rows], dtype=np.int32)
    thr = 1.0 - float(eps)
    id_type = _id_type(corpus, id_col)

    assign_schema = T.StructType.fromDDL(
        f"{id_col} {id_type}, cell int, cent_sim double, {vec_col} array<double>"
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sims = _normalize(M) @ C.T
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cids[best],
                    "cent_sim": sims[np.arange(len(M)), best],
                    vec_col: pdf[vec_col],
                }
            )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign, schema=assign_schema
    )

    out_schema = T.StructType.fromDDL(
        f"{id_col} {id_type}, cell int, cent_sim double, keep boolean"
    )

    from edspdf_spark.operators.grouped import group_bounds

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame = None
        def flush(g: pd.DataFrame) -> pd.DataFrame:
            cells_arr = g["cell"].to_numpy()
            starts, ends = group_bounds(cells_arr)
            keep = np.ones(len(g), dtype=bool)
            embs = g[vec_col].to_numpy()
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                N = _normalize(
                    np.array([np.asarray(v, np.float64) for v in embs[s:e]])
                )
                G = N @ N.T
                # row arrives priority-sorted: drop i iff some j<i is >= thr
                tri = np.triu(G >= thr, k=1)
                keep[s:e] = ~tri.any(axis=0)
            return pd.DataFrame(
                {
                    id_col: g[id_col],
                    "cell": g["cell"],
                    "cent_sim": g["cent_sim"],
                    "keep": keep,
                }
            )
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            cells_arr = pdf["cell"].to_numpy()
            cut = int(np.argmax(cells_arr == cells_arr[-1]))
            buf = pdf.iloc[cut:].reset_index(drop=True)
            if cut:
                yield flush(pdf.iloc[:cut])
        if buf is not None and len(buf):
            yield flush(buf)

    part = assigned.repartition("cell").sortWithinPartitions(
        "cell", "cent_sim", id_col
    )
    return part.mapInPandas(prune, schema=out_schema)


# --------------------------------------------------------------------------
# Product quantization (PQ) — the memory half of the FAISS-style IVF-PQ
# architecture for 10^12-vector ANN: vectors compress to m code bytes
# (64-dim float64 = 512 B → m=8 codes = 8 B, 64×), and queries score
# against codes via an ADC lookup table instead of touching raw vectors.
# Encode/score semantics are MIPS-style (dot product): a sub-vector's code
# is argmax_c (dot(x_s, C_sc) - ||C_sc||²/2) — the L2-argmin rewritten so
# every quantity is a dot product the DuckDB oracle replays bit-for-bit.
# --------------------------------------------------------------------------


def pq_fit(
    sample: np.ndarray, m: int = 8, k: int = 16, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """Per-subspace seeded Lloyd k-means (plain L2, unnormalized — PQ
    quantizes raw sub-vectors). Returns codebooks shaped ``(m, k, d/m)``."""
    sample = np.asarray(sample, dtype=np.float64)
    d = sample.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m} subspaces"
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(k, len(sample)), dsub))
    for s in range(m):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        idx = rng.choice(len(sub), size=min(k, len(sub)), replace=False)
        cent = sub[idx].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def pq_codebooks_df(spark, codebooks: np.ndarray) -> DataFrame:
    """``(s, c, c_emb)`` rows from a ``(m, k, dsub)`` codebook tensor —
    the broadcastable relational form every PQ stage joins against."""
    m, k, dsub = codebooks.shape
    rows = [
        (int(s), int(c), [float(x) for x in codebooks[s, c]])
        for s in range(m)
        for c in range(k)
    ]
    return spark.createDataFrame(rows, "s int, c int, c_emb array<double>")


def _sub_dot(vec_col, s_col, dsub: int, book_col: str):
    """dot(x_s, C_sc) with the subspace offset as a COLUMN — identical
    left-assoc term order in Spark and the SQL oracle."""
    acc = F.lit(0.0)
    for j in range(dsub):
        acc = acc + F.element_at(
            F.col(vec_col), (s_col * dsub + j + 1).cast("int")
        ).cast("double") * F.element_at(F.col(book_col), j + 1).cast("double")
    return acc


def _book_half_norm(book_col: str, dsub: int):
    acc = F.lit(0.0)
    for j in range(dsub):
        e = F.element_at(F.col(book_col), j + 1).cast("double")
        acc = acc + e * e
    return acc / F.lit(2.0)


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Relational PQ encode: one row per ``(id, s)`` with the argmax code.

    Plan: posexplode the subspace index (an 8-element literal array — no
    data motion), broadcast-join the ``m·k``-row codebook, score with a
    ``dsub``-term expression dot (small — never trips the janino method
    limit the full-dim cosine does), argmax via partial-aggregatable
    ``max_by``. One corpus-keyed exchange for the final groupBy; at
    10^12 rows the ``n·m·k`` intermediate never materializes (pipelined
    through the broadcast join). Ties → lowest code, np.argmax-style.
    """
    subs = corpus.select(
        id_col, vec_col, F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("s")
    )
    scored = subs.join(F.broadcast(codebooks), on="s").withColumn(
        "score",
        _sub_dot(vec_col, F.col("s"), dsub, "c_emb")
        - _book_half_norm("c_emb", dsub),
    )
    return scored.groupBy(id_col, "s").agg(
        F.max_by("c", F.struct(F.col("score"), -F.col("c"))).alias("code")
    )


def pq_adc_topk(
    corpus: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame = None,
) -> DataFrame:
    """Exact-ADC top-k over PQ codes, fully relational (the ORACLE twin —
    production serving is :func:`ivfpq_ann_topk`).

    ADC: per query build the ``m·k``-entry lookup table LUT[s,c] =
    dot(q_s, C_sc) (a small explode × broadcast-codebook join — no
    corpus involved), then join corpus CODES on ``(s, c)`` and SUM the m
    looked-up dots per (query, vec). The approximate score
    ``Σ_s dot(q_s, C_s,code_s)`` never touches raw corpus vectors —
    that's the point of PQ: the serve working set is the 8-byte codes.

    Pass a precomputed ``codes`` frame (``(id, s, code)`` — the
    :func:`pq_encode` output, i.e. the persisted index-build artifact at
    10^12 vectors) to serve WITHOUT rescanning raw vectors at all; the
    ``corpus`` argument is then ignored.
    """
    if codes is None:
        codes = pq_encode(
            corpus, codebooks, m=m, dsub=dsub, id_col=id_col, vec_col=vec_col
        )
    lut = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_emb"),
            F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("s"),
        )
        .join(F.broadcast(codebooks), on="s")
        .select(
            "query_id",
            "s",
            F.col("c").alias("code"),
            _sub_dot("q_emb", F.col("s"), dsub, "c_emb").alias("dot"),
        )
    )
    # per-subspace conditional sums folded in FIXED s order — a bare
    # SUM(dot) adds the m addends in partition order, which float-drifts
    # vs a sequential oracle; each conditional sum has exactly one
    # non-null addend so the fold below is the only addition sequence
    # the LUT is nq·m·k rows (queries are the small side by contract) —
    # broadcast it so the corpus codes never shuffle on (s, code)
    per_s = codes.join(F.broadcast(lut), on=["s", "code"]).groupBy(
        "query_id", id_col
    ).agg(
        *[
            F.sum(F.when(F.col("s") == s, F.col("dot"))).alias(f"_d{s}")
            for s in range(m)
        ]
    )
    acc = F.lit(0.0)
    for s in range(m):
        acc = acc + F.col(f"_d{s}")
    scored = per_s.withColumn("adc_score", acc).filter(
        F.col("query_id") != F.col(id_col)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col)
    )


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    seed: int = 42,
    sample_fraction: float = 1.0,
    max_sample_rows: int = None,
    max_queries: int = MAX_QUERY_ROWS,
    refine_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production IVF-PQ-R serving (the FAISS architecture at 10^12
    vectors): an IVF coarse quantizer restricts each query to ``nprobe``
    cells; candidates are SHORTLISTED by Arrow/NumPy ADC over their PQ
    codes (a table-gather — the serve working set is the m-byte codes);
    the top ``refine_factor·k`` of the shortlist are re-scored with the
    exact cosine (FAISS's refine stage — it touches raw vectors for only
    ``O(refine_factor·k)`` rows per query per batch). All vectors are
    L2-normalized before quantization so ADC-dot approximates COSINE —
    without this, PQ ranks by raw dot and recall vs a cosine ground
    truth collapses on mixed-norm corpora.

    Train side: both quantizers fit on one BOUNDED driver sample (same
    guard rails as :func:`ivf_ann_topk`); query side: collected with the
    same hard ``max_queries`` bound as :func:`cosine_topk`.

    Returns ``(query_id, rank, vec_id, cosine)``. Recall vs exact
    cosine top-k is asserted in tests (raise ``nprobe``/``m``/
    ``refine_factor`` for recall, lower for speed — the standard dials).
    """
    if max_sample_rows is None:
        max_sample_rows = max(n_cells * 256, 20_000)
    samp = corpus.select(id_col, vec_col)
    if sample_fraction < 1.0:
        samp = samp.sample(fraction=sample_fraction, seed=seed)
    sample = np.array(
        [
            np.asarray(r[1], dtype=np.float64)
            for r in samp.orderBy(id_col).limit(int(max_sample_rows)).collect()
        ]
    )
    if not len(sample):
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {_id_type(queries, id_col)}, rank int,"
            f" vec_id {_id_type(corpus, id_col)}, cosine double",
        )
    sample = _normalize(sample)
    dim = sample.shape[1]
    dsub = dim // m
    centroids = kmeans_fit(sample, n_cells, seed=seed)  # spherical coarse
    books = pq_fit(sample, m=m, k=k_codes, seed=seed)  # on NORMALIZED vecs

    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"ivfpq_ann_topk collects the query side; got more than "
            f"{max_queries} rows — chunk the queries"
        )
    q_ids = np.array([r[0] for r in q_rows])
    qn = _normalize(np.array([r[1] for r in q_rows], dtype=np.float64))
    # per-query LUTs: (nq, m, k_codes) — dot(qn_s, C_sc); Σ_s ≈ cosine
    luts = np.einsum("qsd,scd->qsc", qn.reshape(len(qn), m, dsub), books)
    # per-query probe cells: (nq, nprobe)
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    shortlist = max(int(refine_factor) * k, k)

    out_schema = (
        f"query_id {_id_type(queries, id_col)},"
        f" vec_id {_id_type(corpus, id_col)}, cosine double"
    )

    def serve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            ids = pdf[id_col].to_numpy()
            cells = (mat @ centroids.T).argmax(axis=1)
            # encode batch: (n, m) codes via per-subspace L2 argmin
            sub = mat.reshape(len(mat), m, dsub)
            scores = np.einsum("nsd,scd->nsc", sub, books) - 0.5 * (
                books**2
            ).sum(axis=2)[None, :, :]
            codes = scores.argmax(axis=2)  # (n, m)
            qs_out, vs_out, sc_out = [], [], []
            for qi in range(len(q_ids)):
                # self excluded HERE, not post-hoc: filtered after the
                # per-batch top-k it would evict a true neighbor from the
                # k slots of the batch that contains the query itself
                mask = np.isin(cells, probes[qi]) & (ids != q_ids[qi])
                if not mask.any():
                    continue
                cand = np.nonzero(mask)[0]
                adc = luts[qi][np.arange(m)[None, :], codes[cand]].sum(axis=1)
                ns = min(shortlist, len(cand))
                short = cand[np.argpartition(-adc, ns - 1)[:ns]]
                # refine: exact cosine on the ADC shortlist only
                exact = mat[short] @ qn[qi]
                kk = min(k, ns)
                top = np.argpartition(-exact, kk - 1)[:kk]
                qs_out.append(np.full(kk, q_ids[qi]))
                vs_out.append(ids[short[top]])
                sc_out.append(exact[top])
            if not qs_out:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qs_out),
                    "vec_id": np.concatenate(vs_out),
                    "cosine": np.concatenate(sc_out),
                }
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(serve, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q", scale_col: str = "q_scale"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the storage-side
    companion to PQ (8× smaller than float64 columns with near-lossless
    cosine; PQ compresses further but lossier). Appends ``q``
    (array<int> in [-127, 127]) and ``q_scale`` (double): ``v_j ≈ q_j ·
    q_scale`` with ``q_scale = max|v| / 127``.

    Pure expressions, zero shuffle. Rounding is ``floor(x + 0.5)``
    (half-up — identical in Spark and DuckDB, unlike banker's
    ``round``); an all-zero vector gets scale 0 and all-zero codes.
    """
    absmax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.when(scale > 0, F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
    )).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0)))
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_embeddings_int8(
    df: DataFrame, q_col: str = "q", scale_col: str = "q_scale", out_col: str = "embedding"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings_int8` (lossy within
    ``q_scale / 2`` per element)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)),
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    pos_query_col: str = "query_id",
    pos_id_col: str = "pos_id",
    exclude_self: bool = True,
    method: str = "exact",
    n_bits: int = 8,
    seed: int = 42,
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: per query,
    the top-``k`` most-similar corpus vectors that are NOT known
    positives (and not the query itself) — the standard negatives source
    for DPR/sentence-transformers-style contrastive training (Karpukhin
    et al. 2020 §3.2 "hard negatives from BM25/dense retrieval", public).

    ``positives`` carries the labeled pairs ``(pos_query_col,
    pos_id_col)``; they (plus the query's own id when ``exclude_self``)
    are removed from the candidate ranking, so the survivors are exactly
    the near-misses the training loss wants.

    Methods:

    * ``"exact"`` — BLAS brute force (:func:`cosine_topk`): one corpus
      scan, partition-local top-k, one k-rows-per-partition shuffle. The
      production exact path.
    * ``"exact_expr"`` — same semantics via pure Catalyst expressions
      with left-assoc sums (:func:`_cos_expr` against a broadcast query
      table), so the ranking is bit-identical to a sequential-SQL oracle.
      Test/oracle twin of ``"exact"``; parity is pytest-asserted.
    * ``"lsh"`` — :func:`lsh_ann_topk` sign-bucket candidates. The
      10^12-corpus path: candidates per query ~ corpus / 2^n_bits and the
      bucket is the shuffle key.

    Overfetch: candidates are retrieved at ``k + max positives per query
    (+1 for self)`` so the post-exclusion ranking still yields k rows —
    the max-per-query count is one tiny aggregate, never a collect of the
    pairs themselves.
    """
    if method not in ("exact", "exact_expr", "lsh"):
        raise ValueError(f"unknown method {method!r}")
    max_pos_row = (
        positives.groupBy(pos_query_col).count().agg(F.max("count")).first()[0]
    )
    fetch = k + int(max_pos_row or 0) + (1 if exclude_self else 0)

    if method == "exact":
        cand = cosine_topk(
            corpus,
            queries,
            k=fetch,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            max_queries=max_queries,
        )
    elif method == "lsh":
        # the query frame must use the same id/vec column names as the
        # corpus — lsh_ann_topk resolves q.{id_col}, so aliasing to a
        # hardcoded "vec_id" breaks any non-default id_col
        q = queries.select(
            F.col(query_id_col).alias(id_col),
            F.col(query_vec_col).alias(vec_col),
        )
        cand = lsh_ann_topk(
            corpus, q, k=fetch, n_bits=n_bits, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    else:  # exact_expr — oracle-replayable ranking
        head = corpus.select(vec_col).head(1)
        if not head:
            return corpus.sparkSession.createDataFrame(
                [],
                f"query_id {_id_type(queries, query_id_col)}, rank int,"
                f" vec_id {_id_type(corpus, id_col)}, cosine double",
            )
        dim = len(head[0][0])
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_q_vec"),
        )
        cand = corpus.crossJoin(F.broadcast(q)).select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            _cos_expr(vec_col, "_q_vec", dim).alias("cosine"),
        )

    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("vec_id"))
    pos = positives.select(
        F.col(pos_query_col).alias("query_id"), F.col(pos_id_col).alias("vec_id")
    )
    # positives are per-query labels — bounded by the query batch, so the
    # anti-join broadcasts on the exact paths; the LSH path leaves the
    # strategy to AQE (query set may be corpus-sized there).
    if method in ("exact", "exact_expr"):
        pos = F.broadcast(pos)
    cand = cand.join(pos, ["query_id", "vec_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
