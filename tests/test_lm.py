"""Bigram-LM perplexity scoring (functions/lm.py): hand-computed case,
an independent plain-Python differential, degenerate docs, and the
CCNet-style gate."""

import math

from pyspark.sql import functions as F
from collections import Counter

import pytest

from edspdf_spark.functions.lm import (
    LP_QUANTUM,
    perplexity_filter,
    train_bigram_lm,
    with_perplexity,
)


def _py_lm(train_texts):
    c12, c1 = Counter(), Counter()
    vocab = set()
    for t in train_texts:
        ws = t.strip().lower().split()
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    return c12, c1, len(vocab) + 1


def _py_score(text, c12, c1, v):
    ws = text.strip().lower().split()
    total, n = 0, 0
    for a, b in zip(ws, ws[1:]):
        p = (c12.get((a, b), 0) + 1) / (c1.get(a, 0) + v)
        total += math.floor(math.log(p) * LP_QUANTUM)
        n += 1
    return n, total


def test_perplexity_hand_case(spark):
    train = spark.createDataFrame(
        [(0, "a b a"), (2, "b a")], "doc_id int, text string"
    )
    lm = train_bigram_lm(train)
    docs = spark.createDataFrame([(1, "a b a c")], "doc_id int, text string")
    row = with_perplexity(docs, lm).collect()[0]
    # v = |{a,b}| + 1 = 3; p(b|a)=(1+1)/(1+3), p(a|b)=(2+1)/(2+3),
    # p(c|a)=(0+1)/(1+3); floors: -6932, -5109, -13863
    assert row["lm_n_bigrams"] == 3
    assert row["lm_lp_micro"] == -6932 - 5109 - 13863
    assert row["ppl"] == pytest.approx(math.exp(25904 / LP_QUANTUM / 3))


def test_perplexity_python_differential(spark):
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(30)]
    texts = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 25))))
        for i in range(120)
    ]
    train_texts = [t for i, t in texts if i % 2 == 0]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    lm = train_bigram_lm(df.where("doc_id % 2 = 0"))
    got = {
        r["doc_id"]: (r["lm_n_bigrams"], r["lm_lp_micro"])
        for r in with_perplexity(df, lm).collect()
    }
    c12, c1, v = _py_lm(train_texts)
    for i, t in texts:
        assert got[i] == _py_score(t, c12, c1, v), f"doc {i}"


def test_perplexity_degenerate_docs(spark):
    train = spark.createDataFrame([(0, "x y x y")], "doc_id int, text string")
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "solo"), (4, "x y")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in with_perplexity(docs, train_bigram_lm(train)).collect()}
    for i in (1, 2, 3):
        assert rows[i]["lm_n_bigrams"] == 0
        assert rows[i]["lm_lp_micro"] == 0
        assert rows[i]["ppl"] is None
    assert rows[4]["lm_n_bigrams"] == 1
    assert rows[4]["ppl"] is not None


def test_perplexity_filter_gate(spark):
    # fluent docs repeat trained bigrams; the gibberish doc is all-OOV
    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat sat")],
        "doc_id int, text string",
    )
    lm = train_bigram_lm(train)
    docs = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "zq xv jk pw nm qq rr ss")],
        "doc_id int, text string",
    )
    scored = {r["doc_id"]: r["ppl"] for r in with_perplexity(docs, lm).collect()}
    assert scored[10] < scored[11]
    kept = perplexity_filter(docs, lm, max_ppl=scored[10] + 0.01)
    assert [r["doc_id"] for r in kept.collect()] == [10]
    assert kept.columns == ["doc_id", "text"]


def test_perplexity_partitioning_invariance(spark):
    """Integer micro-unit sums are exact: identical scores at any
    partitioning (the summation-order hazard a double sum would have)."""
    texts = [(i, " ".join(f"t{(i * 7 + j) % 13}" for j in range(20))) for i in range(60)]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    lm = train_bigram_lm(df)
    a = sorted(
        (r["doc_id"], r["lm_lp_micro"])
        for r in with_perplexity(df.repartition(1), lm).collect()
    )
    b = sorted(
        (r["doc_id"], r["lm_lp_micro"])
        for r in with_perplexity(df.repartition(16), lm).collect()
    )
    assert a == b


def test_perplexity_buckets_terciles(spark):
    """Per-lang tercile assignment with sample_mod=1 (whole corpus as its
    own sample): 30 docs per lang with strictly increasing perplexity ->
    10 head / 10 middle / 10 tail, and the cut is rank-exact."""
    from edspdf_spark.functions.lm import perplexity_buckets

    rows = []
    for lang_i, lang in enumerate(("en", "fr")):
        for i in range(30):
            did = lang_i * 1000 + i
            # more rare-word bigrams -> higher perplexity, monotone in i
            common = " ".join("the cat" for _ in range(30 - i))
            rare = " ".join(f"z{did}x{j}" for j in range(i + 1))
            rows.append((did, lang, f"{common} {rare}"))
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    lm = train_bigram_lm(df.where(F.col("doc_id") % 2 == 0))
    out = perplexity_buckets(df, lm).collect()
    for lang in ("en", "fr"):
        per = sorted(
            (r.nlp_milli, r.doc_id, r.ppl_bucket)
            for r in out
            if r.lang == lang
        )
        assert [b for _, _, b in per] == (
            ["head"] * 10 + ["middle"] * 10 + ["tail"] * 10
        )


def test_perplexity_buckets_sampled_thresholds_and_unscored(spark):
    """sample_mod>1 cuts on a hash slice: thresholds replayed in plain
    Python agree with the assignment; 0-bigram docs land in 'unscored'."""
    import math

    from edspdf_spark.functions.dsir import _hex15_hash  # noqa: F401
    from edspdf_spark.functions.lm import perplexity_buckets

    rows = [
        (i, "en", " ".join(f"w{(i * 3 + j) % 17}" for j in range(12)))
        for i in range(80)
    ]
    rows.append((900, "en", "solo"))  # 1 token -> 0 bigrams -> unscored
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    lm = train_bigram_lm(df.where(F.col("doc_id") % 2 == 0))
    out = {r.doc_id: r for r in perplexity_buckets(df, lm, sample_mod=4).collect()}
    assert out[900].ppl_bucket == "unscored" and out[900].nlp_milli is None

    # replay: which docs are in the hash sample?
    import hashlib

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sample = sorted(
        (r.nlp_milli, r.doc_id)
        for r in out.values()
        if r.nlp_milli is not None and h15(f"pplbkt|{r.doc_id}") % 4 == 0
    )
    n = len(sample)
    assert n >= 3
    t1 = sample[math.ceil(n / 3) - 1][0]
    t2 = sample[math.ceil(2 * n / 3) - 1][0]
    for r in out.values():
        if r.nlp_milli is None:
            continue
        want = "head" if r.nlp_milli <= t1 else ("middle" if r.nlp_milli <= t2 else "tail")
        assert r.ppl_bucket == want, (r.doc_id, r.nlp_milli, t1, t2)


def test_perplexity_buckets_partitioning_invariance(spark):
    from edspdf_spark.functions.lm import perplexity_buckets

    rows = [
        (i, ("en", "fr")[i % 2], " ".join(f"q{(i + j) % 11}" for j in range(15)))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    lm = train_bigram_lm(df)
    a = sorted(
        (r.doc_id, r.nlp_milli, r.ppl_bucket)
        for r in perplexity_buckets(df.repartition(1), lm, sample_mod=2).collect()
    )
    b = sorted(
        (r.doc_id, r.nlp_milli, r.ppl_bucket)
        for r in perplexity_buckets(df.repartition(16), lm, sample_mod=2).collect()
    )
    assert a == b


def test_ccnet_recipe_end_to_end(spark):
    """The CCNet pipeline (Wenzek et al. 2020) through the real
    operators: trained lang-ID (OvR head) → per-predicted-lang bigram-LM
    perplexity terciles → keep the 'head' cut. Languages are separable
    by vocabulary, docs within a language vary in fluency (rare-token
    fraction), and the head cut must prefer the fluent third."""
    from edspdf_spark.functions.classifier import fit_ovr_hashed, predict_ovr
    from edspdf_spark.functions.lm import perplexity_buckets, train_bigram_lm

    vocab = {
        "en": "the quick brown fox jumps over lazy dog house garden".split(),
        "fr": "le chat noir dort sur la table pres de fenetre".split(),
    }
    rows = []
    i = 0
    for lang, words in vocab.items():
        for k in range(30):
            # k controls disfluency: more unique junk tokens -> higher ppl
            common = " ".join(words[(k + j) % len(words)] for j in range(20 - (k % 10)))
            junk = " ".join(f"zq{i}x{j}" for j in range(k % 10))
            rows.append((i, lang, f"{common} {junk}".strip()))
            i += 1
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")

    w = fit_ovr_hashed(df, label_col="lang", m_buckets=512, epochs=3)
    tagged = predict_ovr(df.select("doc_id", "text"), w, m_buckets=512)
    lm = train_bigram_lm(
        tagged.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    )
    bucketed = perplexity_buckets(
        tagged.select("doc_id", F.col("ovr_pred").alias("lang"), "text"), lm
    )
    out = bucketed.collect()
    # lang-ID must be essentially perfect on this separable corpus
    truth = {r_[0]: r_[1] for r_ in rows}
    acc = sum(r.lang == truth[r.doc_id] for r in out) / len(out)
    assert acc >= 0.95
    head = [r for r in out if r.ppl_bucket == "head"]
    tail = [r for r in out if r.ppl_bucket == "tail"]
    assert head and tail
    # the head cut is more fluent: lower mean nlp_milli than the tail
    mean = lambda xs: sum(xs) / len(xs)
    assert mean([r.nlp_milli for r in head]) < mean([r.nlp_milli for r in tail])
