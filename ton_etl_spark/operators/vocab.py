"""Corpus-level vocabulary / distribution statistics.

Reference parity: the reference's datamart layer publishes corpus-level
aggregate tables (datamart/ queries build top-N and distribution
rollups over the parsed stream); this module is the LLM-curation
rendering of that family over the `documents` table:

  * vocab_topk       — global token frequency top-k (tokenizer /
                       vocab-building precursor)
  * source_salient_terms — per-source distinctive terms: top tokens by
                       in-source frequency among tokens appearing in at
                       most `max_df` sources (an integer-only TF-IDF
                       stand-in — no float log, so the result is
                       hash-stable across engines)
  * length_histogram — fixed-width doc-length histogram per group

Scale notes (100 TB): every kernel is explode -> hash-aggregate, which
Spark executes with map-side partial aggregation — the shuffle carries
one row per (partition, token), not per token occurrence, and natural
language vocabulary is sublinear in corpus size (Heaps' law), so the
reduce side stays small no matter the input. The top-k is
`orderBy(...).limit(k)`, which Spark plans as TakeOrderedAndProject
(per-partition heap top-k, driver merge of k rows per partition) —
no global sort ever materializes. Zero Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def _tokens(text_col):
    """Whitespace tokens of trimmed text, empty tokens dropped (matches
    the oracle's string_split_regex + filter '' contract on blank
    docs)."""
    return F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def vocab_topk(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Global token-frequency top-k: (tok, n), ties broken by token so
    the returned SET is deterministic at any parallelism."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(k)
    )


def source_salient_terms(
    df: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Per-group distinctive terms: the k tokens with the highest
    in-group count among tokens whose document-frequency (number of
    distinct groups containing the token) is <= max_df. Integer-only
    TF-IDF stand-in: tf ranks within the group, the df cutoff supplies
    the "inverse document frequency" selectivity, and no float ever
    enters the result — hash-stable across engines by construction.

    One explode + one (group, tok) hash agg; df comes from a second agg
    over that (already small) table; top-k per group is a single window
    over the aggregate — the wide text column never shuffles.
    """
    tf = (
        df.select(F.col(group_col).alias("grp"), F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    w = W.partitionBy("grp").orderBy(F.desc("tf"), "tok")
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("grp", "tok", "tf", "df", "rank")
    )


def length_histogram(
    df: DataFrame,
    len_col: str,
    width: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of an integer length column, optionally per
    group: (group..., bucket, n_docs, sum_len). Pure hash agg; bucket =
    floor(len/width) in BIGINT so the oracle arithmetic is identical."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    keys = list(group_cols or [])
    # floor, not truncate-toward-zero: identical to the oracle's // even
    # if a caller ever feeds a negative length
    bucket = F.floor(F.col(len_col).cast("long") / F.lit(width)).cast("long")
    return (
        df.groupBy(*keys, bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(len_col).cast("long")).alias("sum_len"),
        )
    )
