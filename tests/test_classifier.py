"""Hashed-ngram logistic quality classifier — separable toy corpus,
partitioning invariance, and serve-path sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from edspdf_spark.functions.classifier import (
    fit_logreg_hashed,
    predict_logreg,
)

GOOD = "a thoughtful well written article about science history and careful analysis"
BAD = "click here buy now cheap viagra casino winner free free free prize"


def _corpus(spark, n=40, parts=4):
    rows = []
    for i in range(n):
        rows.append((i, f"{GOOD} piece {i}", 1))
    for i in range(n, 2 * n):
        rows.append((i, f"{BAD} spam {i}", 0))
    return spark.createDataFrame(
        rows, "doc_id int, text string, label int"
    ).repartition(parts)


def test_logreg_learns_separable(spark):
    corpus = _corpus(spark)
    w = fit_logreg_hashed(corpus, m_buckets=512, epochs=4)
    scored = predict_logreg(corpus, w, m_buckets=512)
    rows = {r.doc_id: (r.lr_pred, r.lr_prob) for r in scored.collect()}
    acc = sum(
        1
        for i, (pred, _) in rows.items()
        if pred == (i < 40)
    ) / len(rows)
    assert acc >= 0.95
    # probabilities ordered: every good doc scores above every bad doc
    worst_good = min(rows[i][1] for i in range(40))
    best_bad = max(rows[i][1] for i in range(40, 80))
    assert worst_good > best_bad


def test_logreg_partitioning_invariant(spark):
    a = fit_logreg_hashed(_corpus(spark, parts=1), m_buckets=256, epochs=3)
    b = fit_logreg_hashed(_corpus(spark, parts=7), m_buckets=256, epochs=3)
    wa = sorted((r.bucket, r.w_micro) for r in a.collect())
    wb = sorted((r.bucket, r.w_micro) for r in b.collect())
    assert wa == wb  # bit-identical model under different partitioning


def test_logreg_serve_unseen_and_blank(spark):
    corpus = _corpus(spark)
    w = fit_logreg_hashed(corpus, m_buckets=512, epochs=4)
    unseen = spark.createDataFrame(
        [
            (1000, f"{GOOD} fresh text"),
            (1001, f"{BAD} fresh spam"),
            (1002, "   "),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.lr_pred for r in predict_logreg(unseen, w, m_buckets=512).collect()}
    assert got[1000] is True
    assert got[1001] is False
    assert got[1002] in (True, False)  # blank doc scores the bias only


# --- multi-class one-vs-rest (trained language ID) -------------------------

LANG_VOCAB = {
    "en": "the quick brown fox jumps over lazy dog house garden",
    "fr": "le chat noir dort sur la table pres de la fenetre",
    "de": "der hund lauft schnell durch den grossen dunklen wald heute",
}


def _lang_corpus(spark, n=30, parts=4):
    rows = []
    i = 0
    for lang, vocab in LANG_VOCAB.items():
        for k in range(n):
            words = vocab.split()
            text = " ".join(words[(k + j) % len(words)] for j in range(12))
            rows.append((i, text, lang))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id int, text string, lang string"
    ).repartition(parts)


def test_ovr_learns_separable_languages(spark):
    from edspdf_spark.functions.classifier import fit_ovr_hashed, predict_ovr

    corpus = _lang_corpus(spark)
    w = fit_ovr_hashed(corpus, m_buckets=512, epochs=4)
    got = predict_ovr(corpus, w, m_buckets=512).collect()
    acc = sum(r.ovr_pred == r.lang for r in got) / len(got)
    assert acc >= 0.95, acc
    # weight table covers every class including its bias row
    wrows = w.collect()
    assert {r.cls for r in wrows} == set(LANG_VOCAB)
    assert all(any(r.bucket == -1 for r in wrows if r.cls == c) for c in LANG_VOCAB)


def test_ovr_partitioning_invariant(spark):
    from edspdf_spark.functions.classifier import fit_ovr_hashed

    a = fit_ovr_hashed(_lang_corpus(spark, parts=1), m_buckets=256, epochs=3)
    b = fit_ovr_hashed(_lang_corpus(spark, parts=16), m_buckets=256, epochs=3)
    wa = sorted((r.cls, r.bucket, r.w_micro) for r in a.collect())
    wb = sorted((r.cls, r.bucket, r.w_micro) for r in b.collect())
    assert wa == wb


def test_ovr_serve_unseen_vocab_and_ties(spark):
    from edspdf_spark.functions.classifier import fit_ovr_hashed, predict_ovr

    corpus = _lang_corpus(spark)
    w = fit_ovr_hashed(corpus, m_buckets=512, epochs=4)
    unseen = spark.createDataFrame(
        [(900, "zzz qqq completely unseen tokens"), (901, "le chat noir dort")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.ovr_pred for r in predict_ovr(unseen, w, m_buckets=512).collect()}
    assert got[901] == "fr"
    assert got[900] in set(LANG_VOCAB)  # bias-only doc still gets a class
