"""Subword tokenizer (SentencePiece-lite), Spark-native: a relational
vocab builder + a greedy longest-match encode stage — the token-budget
backbone of a training-data pipeline (real subword counts for sampling,
packing and dedup instead of whitespace approximations).

- ``build_subword_vocab`` — candidate pieces are ALL substrings (up to
  ``max_piece_len``) of the corpus's words, SentencePiece-style ``▁``
  word-boundary marker included; counts aggregate relationally (explode →
  (piece)-keyed SUM with map-side partials) and the vocab is the top-N by
  (count, piece) — a distributed ``TakeOrderedAndProject``, no collect of
  anything corpus-sized. Every single character is force-included so
  greedy encoding never hits OOV on seen alphabets (the WordPiece
  completeness trick); an ``<unk>`` piece covers unseen characters at
  serve time.
- ``tokenize_subword`` — greedy longest-match-first encode (WordPiece's
  inference rule, which is also how SentencePiece serves a BPE/unigram
  vocab). An inherently iterative per-word loop, i.e. exactly the case
  the engine's UDF policy reserves for Arrow stages: one
  ``mapInPandas`` with a per-batch word→pieces memo (Zipf makes the memo
  hit rate ~90%+), vocab broadcast once per executor via closure.

The vocab build is value-level SQL-replayable (same explode/count/top-N
in DuckDB); the greedy encode is checked by pytest round-trip laws
(pieces concatenate back to the word; determinism; budget counts).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOUNDARY = "▁"  # ▁ SentencePiece word-boundary marker
UNK = "<unk>"


def _words(col):
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.lower(col)), r"\s+")
    )


def build_subword_vocab(
    corpus: DataFrame,
    size: int = 1024,
    max_piece_len: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Top-``size`` substring pieces ``(piece, n)`` by corpus frequency
    (ties → lexicographically smaller piece), single characters always
    included (they count against ``size``; if singles alone exceed it,
    all singles are still kept so encoding stays total)."""
    words = corpus.select(
        F.explode(_words(F.col(text_col))).alias("w")
    ).select(F.concat(F.lit(BOUNDARY), F.col("w")).alias("w"))
    L = int(max_piece_len)
    pieces = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1), F.least(F.lit(L), F.length("w") - i + 1)
                        ),
                        lambda l: F.substring(F.col("w"), i, l),
                    ),
                )
            )
        ).alias("piece")
    )
    counts = pieces.groupBy("piece").agg(F.count(F.lit(1)).alias("n"))
    singles = counts.where(F.length("piece") == 1)
    # ALL singles are kept unconditionally (the completeness guarantee —
    # a final trim-to-size over a singles-first ordering silently dropped
    # the rarest seen characters whenever the alphabet alone exceeded
    # ``size``, making greedy encoding emit UNK on seen text); multis
    # fill only the slots singles leave free. The singles count is one
    # tiny scalar aggregate, never corpus-sized.
    n_singles = singles.count()
    n_multi = max(0, int(size) - n_singles)
    multis = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("n").desc(), F.col("piece").asc())
        .limit(n_multi)
    )
    return singles.unionByName(multis).select("piece", "n")


def fit_bpe(
    corpus: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
):
    """Byte-pair-encoding merge-rule learning (Sennrich et al. 2016),
    relationally. The iteration state is the DISTINCT-WORD table
    ``(w, cnt, syms)`` — Zipf makes it far smaller than the corpus, and
    it is the same working-set trick fastBPE/HF trainers use. Per merge
    round, everything is Catalyst expressions:

    * pair counts = explode adjacent symbol pairs weighted by word count
      → one pair-keyed SUM with map-side partials;
    * the argmax pair = ``orderBy(n desc, l, r).limit(1)`` — a one-row
      collect (ties broken lexicographically so training is bit-identical
      under any partitioning);
    * the merge applies as a pure ``F.aggregate`` left-fold over each
      symbol array (left-to-right non-overlapping, the BPE rule — so
      ``aaaa`` + merge ``(a,a)`` → ``[aa, aa]``), zero UDFs;
    * ``localCheckpoint`` per round truncates the plan lineage, exactly
      like the logistic-GD trainer.

    Inherently sequential in the number of MERGES (each argmax depends on
    the last), like every BPE trainer; each round costs one agg over the
    bounded word table, not the corpus. Returns ``(merges, words)``:
    ``merges(rank, left, right, n)`` and the final segmented word table
    ``words(w, cnt, syms)``.
    """
    spark = corpus.sparkSession
    words = (
        corpus.select(F.explode(_words(F.col(text_col))).alias("w0"))
        .groupBy("w0")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.concat(F.lit(BOUNDARY), F.col("w0")).alias("w"), "cnt")
        .withColumn("syms", F.split("w", ""))
        .localCheckpoint()
    )
    merges = []
    for rank in range(int(n_merges)):
        pairs = (
            words.where(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not best:
            break
        b = best[0]
        merges.append((rank, b.l, b.r, int(b.n)))
        joined = F.lit(b.l + b.r)
        words = words.withColumn(
            "syms",
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(b.l))
                    & (x == F.lit(b.r)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(joined)),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        ).localCheckpoint()
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, n bigint"
    )
    return merges_df, words


def _bpe_word(word: str, merges: list) -> list:
    syms = list(word)
    for left, right in merges:
        out: list = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def tokenize_bpe(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Serve path: apply the learned merges in rank order to each word —
    the canonical BPE encode. The merge table (bounded by ``n_merges``)
    collects once and rides the closure; the corpus streams through one
    Arrow stage with a per-batch word memo (same shape as
    ``tokenize_subword``). Appends ``pieces`` + ``n_pieces``."""
    ranked = [
        (r.left, r.right)
        for r in merges.select("rank", "left", "right").orderBy("rank").collect()
    ]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            rows = []
            for text in pdf[text_col]:
                pieces: list = []
                for w in (text or "").lower().split():
                    key = BOUNDARY + w
                    got = memo.get(key)
                    if got is None:
                        got = _bpe_word(key, ranked)
                        memo[key] = got
                    pieces.extend(got)
                rows.append(pieces)
            out = pdf[[id_col]].copy()
            out["pieces"] = rows
            out["n_pieces"] = [len(p) for p in rows]
            yield out

    id_t = dict(df.dtypes)[id_col]
    encoded = df.select(id_col, text_col).mapInPandas(
        encode, schema=f"{id_col} {id_t}, pieces array<string>, n_pieces long"
    )
    return df.join(encoded.select(id_col, "pieces", "n_pieces"), on=id_col)


def _greedy(word: str, vocab: set, max_len: int) -> list:
    out = []
    i, n = 0, len(word)
    while i < n:
        j = min(n, i + max_len)
        while j > i and word[i:j] not in vocab:
            j -= 1
        if j == i:  # unseen character
            out.append(UNK)
            i += 1
        else:
            out.append(word[i:j])
            i = j
    return out


def tokenize_subword(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each doc: appends ``pieces`` (array<string>) and
    ``n_pieces``. The vocab (bounded by its build ``size``) collects to
    the driver ONCE and rides the task closure — the standard
    small-model broadcast; the corpus streams through one Arrow stage."""
    vset = {r.piece for r in vocab.select("piece").collect()}
    max_len = max((len(p) for p in vset), default=1)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            rows = []
            for text in pdf[text_col]:
                pieces: list = []
                for w in (text or "").lower().split():
                    key = BOUNDARY + w
                    got = memo.get(key)
                    if got is None:
                        got = _greedy(key, vset, max_len)
                        memo[key] = got
                    pieces.extend(got)
                rows.append(pieces)
            out = pdf[[id_col]].copy()
            out["pieces"] = rows
            out["n_pieces"] = [len(p) for p in rows]
            yield out

    id_t = dict(df.dtypes)[id_col]
    encoded = df.select(id_col, text_col).mapInPandas(
        encode, schema=f"{id_col} {id_t}, pieces array<string>, n_pieces long"
    )
    return df.join(encoded.select(id_col, "pieces", "n_pieces"), on=id_col)
