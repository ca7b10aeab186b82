"""PII detection and redaction over text columns.

Reference parity: the reference's parser layer normalizes and strips
sensitive payload fields before publishing (parsers/ rewrite raw
payloads into the public datamart shape); this is the corpus-curation
rendering — scan for personally-identifying spans and replace them with
typed placeholder tokens before the text enters a training corpus.

All patterns are deliberately written in the RE2-compatible subset
(no backreferences, no lookaround) so the SAME pattern string runs in
Spark's java.util.regex AND DuckDB's RE2 — the oracle is the identical
regex, making cross-engine drift in the pattern semantics itself a test
failure rather than a silent difference.

Scale notes (100 TB): pure column expressions — regexp_extract_all /
regexp_replace are JVM-side inside whole-stage codegen, zero Python,
zero shuffle; the scan is a projection so column pruning and filter
pushdown through it are free. Each pattern adds one pass over the
string; patterns are applied in a fixed documented order so redaction
is deterministic (an email is never half-eaten by the phone pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ordered: longer/more-specific first so placeholder insertion can't
# create new matches for a later pattern. RE2-safe (see module doc).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def scan_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Append one `n_<kind>` BIGINT match-count column per pattern."""
    out = df
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).cast("long"),
        )
    return out


def redact_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Replace every PII match with `<KIND>` placeholders, in the fixed
    PII_PATTERNS order. Emits `out_col` (default `<text_col>_redacted`)."""
    col = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        col = F.regexp_replace(col, pat, f"<{kind.upper()}>")
    return df.withColumn(out_col or f"{text_col}_redacted", col)


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row PII audit: match counts per kind, total, and the sha256
    of the redacted text (so downstream can verify the scrub without
    shipping the original). One projection, no shuffle."""
    scanned = redact_pii(scan_pii(df, text_col), text_col, "_red")
    counts = [F.col(f"n_{kind}") for kind, _ in PII_PATTERNS]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return scanned.select(
        id_col,
        *[f"n_{kind}" for kind, _ in PII_PATTERNS],
        total.alias("n_pii"),
        F.sha2(F.col("_red"), 256).alias("redacted_sha"),
    )
