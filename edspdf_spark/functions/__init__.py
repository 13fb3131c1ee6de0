from edspdf_spark.functions.text import (
    with_token_stats,
    with_quality,
    with_lang_guess,
    with_fingerprint,
    with_readability,
    with_line_dedup,
    dedup_adjacent_lines,
)
from edspdf_spark.functions.dedup import (
    dedup_exact,
    dedup_spans,
    dedup_substrings,
    dedup_components,
    select_canonical,
    keep_latest_revision,
    normalize_text,
    minhash_signatures,
    lsh_candidate_pairs,
    simhash64,
    ngram_jaccard_pairs,
)
from edspdf_spark.functions.lm import (
    train_bigram_lm,
    with_perplexity,
    perplexity_buckets,
    perplexity_filter,
)
from edspdf_spark.functions.quality import (
    blocklist_filter,
    domain_blocklist_filter,
    sample_corpus,
    split_assign,
    temperature_mix,
    with_blocklist_signals,
    with_temperature_mix,
)
from edspdf_spark.functions.classifier import (
    fit_logreg_hashed,
    fit_ovr_hashed,
    predict_logreg,
    predict_ovr,
)
from edspdf_spark.functions.search import (
    bm25_topk,
    build_text_index,
    tfidf_keywords,
)
from edspdf_spark.functions.multimodal import (
    dhash_candidate_pairs,
    image_dhash,
)
from edspdf_spark.functions.similarity import cosine_topk, lsh_ann_topk
from edspdf_spark.functions.urls import canonicalize_url, dedup_url_groups

__all__ = [
    "canonicalize_url",
    "dedup_url_groups",
    "with_token_stats",
    "with_quality",
    "with_lang_guess",
    "with_fingerprint",
    "with_readability",
    "with_line_dedup",
    "dedup_adjacent_lines",
    "dedup_exact",
    "dedup_spans",
    "dedup_substrings",
    "dedup_components",
    "select_canonical",
    "keep_latest_revision",
    "normalize_text",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "train_bigram_lm",
    "with_perplexity",
    "perplexity_buckets",
    "perplexity_filter",
    "blocklist_filter",
    "domain_blocklist_filter",
    "sample_corpus",
    "split_assign",
    "temperature_mix",
    "with_blocklist_signals",
    "with_temperature_mix",
    "fit_logreg_hashed",
    "fit_ovr_hashed",
    "predict_logreg",
    "predict_ovr",
    "bm25_topk",
    "build_text_index",
    "tfidf_keywords",
    "cosine_topk",
    "lsh_ann_topk",
    "image_dhash",
    "dhash_candidate_pairs",
]
