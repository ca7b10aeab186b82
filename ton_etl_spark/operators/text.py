"""Text-analysis operators for corpus curation — all pure column
expressions (whole-stage codegen, zero Python), deliberately written so
an identical ANSI-SQL formulation exists for the DuckDB oracle.

  * token counting (whitespace + a BPE-ish word/punct regex)
  * quality scoring (length / punctuation / stopword ratios)
  * language ID (stopword-marker heuristic)
  * document fingerprinting (normalize -> sha256)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PUNCT_CLASS = r"[.,;:!?()\[\]{}\"']"

# marker stopwords per language for the n-gram-free heuristic; scoring
# counts marker OCCURRENCES so the same SQL works in DuckDB
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}


def ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation
    marks counted separately (regexp, still JVM-side)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), F.lit(1)
        )
    )


def raw_punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, PUNCT_CLASS, "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def punct_ratio(text: Column) -> Column:
    return F.round(raw_punct_ratio(text), 6)


def raw_stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or [w for ws in LANG_MARKERS.values() for w in ws]
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    return F.round(raw_stopword_ratio(text, stopwords), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality heuristic: favor mid-length docs with
    some stopwords and moderate punctuation. Built from RAW ratios (not
    the 6dp-rounded display columns) — pre-rounded inputs would put the
    composite exactly on 7th-decimal rounding ties, where Spark and
    DuckDB round() diverge."""
    n = token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.5 * len_score
        + 0.3 * F.least(raw_stopword_ratio(text) * 5, F.lit(1.0))
        + 0.2 * (1 - F.least(raw_punct_ratio(text) * 4, F.lit(1.0))),
        6,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def detect_language(text: Column) -> Column:
    """argmax over marker-hit counts; 'und' when no marker seen. Ties
    break by fixed language order (en, es, de, fr) — a CASE chain
    mirrored verbatim in the DuckDB oracle SQL."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = tiebreak priority
        expr = expr.when(s[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: lowercase, strip punctuation,
    collapse whitespace, sha256."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(text), PUNCT_CLASS, ""), r"\s+", " "
    )
    return F.sha2(F.trim(norm), 256)


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (1-based element_at).
    Guarded with WHEN because Spark's sequence(1, 0) yields a
    DESCENDING [1, 0], not an empty array."""
    if n == 1:
        return toks
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _max_gram_count(grams: Column) -> Column:
    """Occurrences of the most frequent element: sort the array, then
    one aggregate() pass tracking the longest run of equal neighbors —
    O(n log n) per row instead of the O(distinct * n)
    filter-per-distinct-element formulation (measured ~3x on the
    benchmark corpus; HOFs evaluate interpreted, so per-row constants
    matter). Empty array -> 0. For book-length docs the explode ->
    groupBy formulation (one shuffle, linear, codegen'd) is the
    scale-out alternative."""
    s = F.array_sort(grams)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        # acc.prev == x is NULL for the first element -> otherwise(1)
        run = F.when(acc["prev"] == x, acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(s, acc0, step, lambda acc: acc["best"])


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", §A1.1 repetition filters — public
    paper): documents dominated by a few repeated words/n-grams are
    low-quality for pretraining.

    Per document (all pure column expressions, zero Python):
      n_tokens         - lowercased whitespace tokens
      n_distinct       - distinct tokens
      top_word_count   - occurrences of the most frequent token
      top_bigram_count - occurrences of the most frequent word bigram
      dup_word_frac    - 1 - n_distinct/n_tokens
      top_word_frac    - top_word_count / n_tokens
      top_bigram_frac  - 2*top_bigram_count / n_tokens (token share)

    The integer counts are exact and engine-portable; the fractions are
    6dp-rounded for display/filtering.

    STAGED through explicit projections on purpose: higher-order
    functions evaluate interpreted (outside codegen), so an inlined
    one-projection formulation re-runs the regex split per lambda
    element — O(distinct * len) regex evaluations per ROW (~80 ms/doc
    measured). Aliasing the arrays first materializes each once per
    row; CollapseProject keeps the stages because the aliases are
    non-cheap and referenced more than once (Spark >= 3.3 inlining
    rule), after which the lambdas only scan in-memory arrays."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), toks.alias("_toks"))
    t = F.col("_toks")
    staged = base.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        _max_gram_count(t).cast("long").alias("top_word_count"),
        word_ngrams(t, 2).alias("_bg"),
    )
    counted = staged.select(
        F.col(id_col),
        "n_tokens",
        "n_distinct",
        "top_word_count",
        _max_gram_count(F.col("_bg")).cast("long").alias("top_bigram_count"),
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    return counted.select(
        F.col(id_col),
        "n_tokens",
        "n_distinct",
        "top_word_count",
        "top_bigram_count",
        F.round(1 - F.col("n_distinct") / denom, 6).alias("dup_word_frac"),
        F.round(F.col("top_word_count") / denom, 6).alias("top_word_frac"),
        F.round(2 * F.col("top_bigram_count") / denom, 6).alias(
            "top_bigram_frac"
        ),
    )


def analyze(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).cast("long").alias("n_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_subtokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        detect_language(t).alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def doc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Sliding-window token chunking: split each document into
    overlapping word windows of `window` tokens starting every
    `stride` tokens (start positions 0, stride, 2*stride, ... while
    start < n_tokens; tail windows may be shorter). This is the
    long-document context-window prep primitive — overlapping chunks
    preserve cross-boundary context that disjoint packing loses.

    Output per chunk: (id, chunk_idx, chunk_len, chunk_sha) — compact,
    engine-portable columns (sha256 of the space-joined chunk) so the
    DuckDB oracle checks the chunking bit-for-bit via list slicing.

    Scale shape: pure column expressions (split / sequence / slice /
    array_join / posexplode — all JVM-side), zero shuffles, zero
    Python; chunking 100 TB is a projection, not a job.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got {window}, {stride}")
    toks = ws_tokens(F.col(text_col))
    n_starts = F.ceil(F.size(toks) / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda i: F.slice(toks, i * stride + 1, window),
    )
    ex = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")
    )
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("_c").cast("long").alias("chunk_len"),
        F.sha2(F.array_join("_c", " "), 256).alias("chunk_sha"),
    )
