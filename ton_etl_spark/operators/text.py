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
