"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Each operator has a DuckDB-portable
formulation used by the correctness oracle (see ``__spark_entry__``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic, engine-portable marker lists for the n-gram language guess
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "los", "las", "es", "una"],
}

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}<>-]"


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def _isin_pred(values):
    # closure factory: a default-arg lambda would change the lambda's arity
    # and make Spark pass the element index as the extra argument
    def pred(w):
        return w.isin(*values)

    return pred


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + mean token length (BPE-ish regex count of
    word pieces as a bonus column)."""
    toks = _tokens(F.col(text_col))
    n_tokens = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "mean_token_len",
            F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                total_len.cast("double") / n_tokens.cast("double")
            ),
        )
        .withColumn(
            "n_word_pieces",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+"), 0)).cast(
                "long"
            ),
        )
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / space / stopword ratio quality signals
    (C4/Gopher-style heuristics, relational form)."""
    t = F.col(text_col)
    length = F.length(t).cast("double")
    safe_len = F.when(length == 0, F.lit(1.0)).otherwise(length)
    punct = length - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    digits = length - F.length(F.regexp_replace(t, "[0-9]", ""))
    spaces = length - F.length(F.regexp_replace(t, " ", ""))
    stop = F.size(
        F.filter(
            F.split(F.lower(t), r"\s+"),
            _isin_pred(LANG_MARKERS["en"]),
        )
    ).cast("double")
    n_tok = F.when(F.trim(t) == "", F.lit(0)).otherwise(F.size(_tokens(t))).cast(
        "double"
    )
    safe_tok = F.when(n_tok == 0, F.lit(1.0)).otherwise(n_tok)
    return (
        df.withColumn("doc_len", length.cast("long"))
        .withColumn("punct_ratio", punct / safe_len)
        .withColumn("digit_ratio", digits / safe_len)
        .withColumn("space_ratio", spaces / safe_len)
        .withColumn("stopword_ratio", stop / safe_tok)
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count exact-token hits per language, argmax
    with deterministic (score DESC, lang ASC) tie-break; 'und' when no
    marker hits at all."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    out = df
    for lang, markers in sorted(LANG_MARKERS.items()):
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.filter(words, _isin_pred(markers))),
        )
    langs = sorted(LANG_MARKERS.keys())
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    guess = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        guess = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best == 0, F.lit("und")).otherwise(guess)
    return out.withColumn("lang_guess", guess).drop(
        *[f"score_{l}" for l in langs]
    )


#: UTF-8 bytes mis-decoded as cp1252/latin-1 → the intended character
#: (ftfy-style repair table, longest sequences first so the 3-byte
#: punctuation forms never get half-eaten by the 2-byte accent rules).
#: Pure string literals, so the repair chain replays identically in SQL.
MOJIBAKE_PAIRS = [
    ("â€™", "’"),  # right single quote
    ("â€˜", "‘"),  # left single quote
    ("â€œ", "“"),  # left double quote
    ("â€\x9d", "”"),  # right double quote (9D unmapped in cp1252)
    ("â€“", "–"),  # en dash
    ("â€”", "—"),  # em dash
    ("â€¦", "…"),  # ellipsis
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ãª", "ê"),
    ("Ã«", "ë"),
    ("Ã¡", "á"),
    ("Ã\xa0", "à"),  # C3 A0 → "Ã" + NBSP
    ("Ã¢", "â"),
    ("Ã®", "î"),
    ("Ã¯", "ï"),
    ("Ã´", "ô"),
    ("Ã¶", "ö"),
    ("Ã¹", "ù"),
    ("Ã»", "û"),
    ("Ã¼", "ü"),
    ("Ã§", "ç"),
    ("Ã±", "ñ"),
    ("Ã³", "ó"),
    ("Ã\xad", "í"),  # C3 AD → "Ã" + soft hyphen
    ("Ãº", "ú"),
    ("Ã‰", "É"),
    ("Ã–", "Ö"),
    ("Ãœ", "Ü"),
    ("Â«", "«"),
    ("Â»", "»"),
    ("Â°", "°"),
    ("Â·", "·"),
    ("Â\xa0", "\xa0"),  # C2 A0 → "Â" + NBSP → plain NBSP
]


def fix_mojibake(col: Column) -> Column:
    """Repair the classic web-corpus encoding damage: UTF-8 text that was
    decoded as cp1252/latin-1 somewhere in the crawl chain ("Ã©" → "é",
    "â€™" → "’"). A fixed longest-first literal-replace chain over
    :data:`MOJIBAKE_PAIRS` — pure JVM string expressions, zero UDFs, one
    pass per pattern inside a single codegen'd projection. (Full ftfy
    does codec round-trip detection; this table covers the dominant
    single-mis-decode class seen in Common-Crawl text.)"""
    out = col
    for broken, fixed in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(broken), F.lit(fixed))
    return out


def chunk_tokens(
    df: DataFrame,
    window: int = 128,
    stride: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """Split each document into fixed token windows for LM training
    samples: chunks start at offsets ``0, stride, 2·stride, …`` while the
    offset is inside the doc, each chunk takes ``window`` whitespace
    tokens (the tail chunk may be shorter; chunks under ``min_tokens``
    are dropped). ``stride < window`` gives overlapping context windows.

    Returns one row per chunk: ``(id_col, chunk_idx, chunk_n_tokens,
    chunk_text)``. Pure array expressions + one ``posexplode`` — a
    zero-shuffle scan-stage operator; output rows scale with token count,
    never with corpus² .
    """
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    offsets = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(int(stride))),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        offsets, lambda o: F.slice(toks, o + 1, int(window))
    )
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_chunk")
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.size("_chunk").cast("long").alias("chunk_n_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    ).where(F.col("chunk_n_tokens") >= F.lit(int(min_tokens)))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: MD5 (engine-portable, used by the oracle) and
    a 64-bit polynomial rolling hash over codepoints (Spark-side)."""
    t = F.col(text_col)
    poly = F.aggregate(
        F.filter(F.split(t, ""), lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(2147483647),
    )
    return df.withColumn("fp_md5", F.md5(t)).withColumn("fp_poly", poly)


def pack_chunks(
    chunks: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "chunk_n_tokens",
) -> DataFrame:
    """GPT-style sequence packing: concatenate chunks in deterministic
    ``(id, idx)`` order and cut the token stream every ``seq_len`` tokens,
    so short documents share training sequences instead of wasting pad.
    A chunk is assigned to the pack its FIRST token falls in (packs can
    overflow by < one chunk; size chunks ≤ seq_len for bounded overflow).

    Exact global packing needs a total order over the corpus — a
    single-partition sort that cannot scale — so packing is SHARD-LOCAL:
    ``shard = hexval(md5(id)) mod n_shards`` (all chunks of a doc stay
    together), the running token offset is one window cumsum per shard
    (shard-keyed exchange + external per-shard sort), and pack ids are
    ``(shard, pack_in_shard)``. At 10^12 docs, raise ``n_shards`` until a
    shard's token stream fits one task's spill budget; each shard's last
    pack is the only fragmentation cost.

    Appends ``shard``, ``pack_id`` (within shard) and ``pack_offset``
    (the chunk's first-token offset within its pack) — all exact BIGINT
    arithmetic, replayable in SQL window functions.
    """
    from pyspark.sql import Window

    from edspdf_spark.functions.dsir import _hex15_hash

    shard = _hex15_hash(F.col(id_col).cast("string")) % F.lit(int(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(idx_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = chunks.withColumn("shard", shard).withColumn(
        "_start", (F.sum(tok_col).over(w) - F.col(tok_col)).cast("long")
    )
    return (
        out.withColumn(
            "pack_id", (F.col("_start") / F.lit(int(seq_len))).cast("long")
        )
        .withColumn("pack_offset", F.col("_start") % F.lit(int(seq_len)))
        .drop("_start")
    )


#: sentence-ish segments: runs up to terminal punctuation (kept), plus a
#: trailing unpunctuated fragment. Java∩RE2 common dialect (no
#: lookaround), so the DuckDB oracle replays it verbatim.
SENTENCE_RE = r"[^.!?]*[.!?]+|[^.!?]+$"


def with_sentences(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based sentence segmentation: appends ``sentences``
    (array<string>, trimmed, empties dropped). Deliberately simple —
    terminal ``.!?`` runs end a sentence, abbreviations are NOT special
    (the C4/Gopher line rules upstream absorb most of that noise) — so
    the rule is a single regexp the whole stack can agree on. One
    ``regexp_extract_all`` projection, zero shuffle."""
    segs = F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0)
    return df.withColumn(
        "sentences",
        F.filter(F.transform(segs, lambda s: F.trim(s)), lambda s: s != ""),
    )


def split_sentences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exploded form: one ``(id, sent_idx, sentence)`` row per sentence
    (0-based index in document order)."""
    return with_sentences(df, text_col).select(
        F.col(id_col),
        F.posexplode("sentences").alias("sent_idx", "sentence"),
    )


def with_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease (Flesch 1948 — the classic educational-value
    quality signal) as INTEGER milli-points, from three exact counts:

    - ``rd_n_words``      whitespace tokens (0 for blank text),
    - ``rd_n_sentences``  ``[.!?]+`` runs, floored at 1 for non-blank text,
    - ``rd_n_syllables``  ``[aeiouy]+`` vowel runs in the lowercased text,
      floored at ``rd_n_words`` (≥1 syllable per word — the standard
      heuristic fix for vowel-less tokens),

    then ``rd_flesch_milli = floor((206.835 − 1.015·w/s − 84.6·sy/w)·1000)``
    — one fixed-shape IEEE double expression over exact BIGINT inputs, so
    Spark and the SQL oracle agree; NULL when the text has no words.
    Pure scan-stage projection: zero joins, zero shuffle.
    """
    low = F.lower(F.col(text_col))
    n_words = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(_tokens(F.col(text_col)))
    ).cast("long")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), F.lit(0))),
        F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.lit(1)),
    ).cast("long")
    vruns = F.size(
        F.regexp_extract_all(low, F.lit(r"[aeiouy]+"), F.lit(0))
    ).cast("long")
    out = (
        df.withColumn("rd_n_words", n_words)
        .withColumn("rd_n_sentences", n_sent)
        .withColumn("rd_n_syllables", F.greatest(vruns, n_words))
    )
    flesch = F.floor(
        (
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("rd_n_words").cast("double") / F.col("rd_n_sentences").cast("double"))
            - F.lit(84.6)
            * (F.col("rd_n_syllables").cast("double") / F.col("rd_n_words").cast("double"))
        )
        * F.lit(1000.0)
    ).cast("long")
    return out.withColumn(
        "rd_flesch_milli",
        F.when(F.col("rd_n_words") > 0, flesch),
    )


def dedup_adjacent_lines(col: Column) -> Column:
    """Collapse runs of identical consecutive lines to one occurrence —
    the intra-document cleanup pass (RefinedWeb-style line dedup;
    navigation chrome and scraped widgets repeat the same line back to
    back). Pure higher-order expression: split on newline, keep line i
    iff ``i == 0`` or it differs from line ``i−1``, rejoin — zero
    shuffle, zero Python, and the DuckDB oracle replays it with a
    ``generate_series`` index filter."""
    lines = F.split(col, "\n", -1)
    # element_at is 1-based: index i (0-based) reads the PREVIOUS line;
    # greatest(i, 1) keeps the i == 0 probe in-bounds (ANSI mode errors
    # on index 0 — the OR branch already decides that row)
    kept = F.filter(
        lines,
        lambda x, i: (i == F.lit(0))
        | (x != F.element_at(lines, F.greatest(i, F.lit(1)).cast("int"))),
    )
    return F.array_join(kept, "\n")


def with_line_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``line_deduped`` (the collapsed text) and
    ``n_lines_removed`` (how many consecutive-duplicate lines were
    dropped) — both scan-stage projections."""
    lines = F.split(F.col(text_col), "\n", -1)
    deduped = dedup_adjacent_lines(F.col(text_col))
    return df.withColumn("line_deduped", deduped).withColumn(
        "n_lines_removed",
        (F.size(lines) - F.size(F.split(F.col("line_deduped"), "\n", -1))).cast(
            "long"
        ),
    )


def sections_to_chunks(
    sections: DataFrame,
    window: int = 128,
    stride: int = 128,
    url_col: str = "url",
    min_tokens: int = 1,
    sep: str = " — ",
) -> DataFrame:
    """Turn :func:`edspdf_spark.operators.extract_html.extract_sections`
    output into titled training chunks: each section's text becomes
    ``"crumb > heading — body"`` (crumb/heading omitted when absent, so a
    preamble chunk is just its text), then :func:`chunk_tokens` windows
    it. One row per chunk — ``(url, seq, chunk_idx, chunk_n_tokens,
    chunk_text)`` — ready for :func:`pack_chunks` keyed on a composite
    ``(url, seq)`` id or for direct shard writing.

    Sections with an empty body and no heading are dropped (nothing to
    train on); a heading with an empty body still yields its title line
    (section stubs carry signal for retrieval-style corpora). Pure
    projections on top of two zero-shuffle operators.
    """
    title = F.concat_ws(
        " > ",
        F.array_compact(
            F.array(F.nullif(F.col("crumb"), F.lit("")), F.col("heading"))
        ),
    )
    text = F.when(
        (title == "") | title.isNull(), F.col("body")
    ).otherwise(
        F.when(
            F.nullif(F.col("body"), F.lit("")).isNull(), title
        ).otherwise(F.concat(title, F.lit(sep), F.col("body")))
    )
    base = sections.select(
        url_col, "seq", text.alias("_sect_text")
    ).where(F.nullif(F.col("_sect_text"), F.lit("")).isNotNull())
    chunked = chunk_tokens(
        base.withColumn("_sid", F.concat_ws("#", url_col, F.col("seq"))),
        window=window,
        stride=stride,
        text_col="_sect_text",
        id_col="_sid",
        min_tokens=min_tokens,
    )
    return chunked.select(
        F.regexp_extract("_sid", r"^(.*)#-?\d+$", 1).alias(url_col),
        F.regexp_extract("_sid", r"#(-?\d+)$", 1).cast("int").alias("seq"),
        "chunk_idx",
        "chunk_n_tokens",
        "chunk_text",
    )
