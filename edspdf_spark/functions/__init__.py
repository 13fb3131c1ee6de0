from edspdf_spark.functions.text import (
    with_token_stats,
    with_quality,
    with_lang_guess,
    with_fingerprint,
)
from edspdf_spark.functions.dedup import (
    dedup_exact,
    dedup_spans,
    dedup_substrings,
    normalize_text,
    minhash_signatures,
    lsh_candidate_pairs,
    simhash64,
    ngram_jaccard_pairs,
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
    "dedup_exact",
    "dedup_spans",
    "dedup_substrings",
    "normalize_text",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "lsh_ann_topk",
]
