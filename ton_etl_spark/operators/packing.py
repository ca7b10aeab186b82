"""Sequence packing for LLM pretraining shards: concatenate documents
in a deterministic order and chunk the token stream into fixed-size
context windows ("concat-and-chunk" packing, the standard GPT-style
pretraining layout).

Scale design (100 TB): the naive formulation is ONE global running sum
of token counts — a single-partition window, i.e. a driver-shaped
bottleneck. Here the corpus is first assigned to SHARDS (any
deterministic key: a hash bucket, a date, a split) and the running
offset is computed per shard with a shard-partitioned window — one
shuffle on the shard key, every partition bounded by the shard size,
embarrassingly parallel across shards. Each shard becomes an
independent stream of packed sequences, which is exactly how training
shards are consumed (one file/worker per shard); sequence ids are
(shard, seq_in_shard) so no cross-shard coordination exists anywhere.

Everything is pure column expressions (whole-stage codegen, zero
Python), written so an identical ANSI-SQL formulation exists for the
DuckDB oracle.

Reference parity note: the reference engine has no packing operator;
this extends the curation surface (SURVEY.md LLM-pipeline section)
alongside dedup/sampling/splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    tokens_col: Column | str = "n_tokens",
    shard_col: Column | str | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document its token interval in the packed stream
    of its shard.

    Documents are laid out per shard in ``id_col`` order (deterministic
    at any parallelism) and the concatenated token stream is chunked
    into windows of ``ctx_len`` tokens; a document may span a chunk
    boundary (concat-and-chunk semantics — no padding, no document
    truncation at boundaries).

    Returns one row per document:
      shard, doc_id, n_tokens,
      begin_offset  - first token position of the doc in its shard
      first_seq     - index of the context window containing begin
      last_seq      - index of the window containing the doc's last
                      token (== first_seq when the doc fits in one)
      n_seqs        - number of windows the doc touches

    ``shard_col`` defaults to ``id_col % n_shards`` (deterministic,
    engine-portable). Empty docs (0 tokens) keep last_seq = first_seq
    and n_seqs = 1 by clamping, so downstream per-seq explodes never
    see a negative span.
    """
    if ctx_len <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")
    ntok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if shard_col is None:
        shard = (F.col(id_col) % F.lit(n_shards)).cast("bigint")
    else:
        shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    base = docs.select(
        shard.alias("shard"),
        F.col(id_col),
        ntok.cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    # running sum INCLUDING the current row, minus the row itself =
    # exclusive prefix -> begin offset. One shuffle (on shard), the
    # window sort is bounded by shard size.
    begin = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "begin_offset"
    )
    out = base.select("shard", id_col, "n_tokens", begin)
    last_tok = F.col("begin_offset") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    first_seq = F.floor(F.col("begin_offset") / ctx_len).alias("first_seq")
    last_seq = F.floor(last_tok / ctx_len).alias("last_seq")
    return out.select(
        "shard",
        id_col,
        "n_tokens",
        "begin_offset",
        first_seq,
        last_seq,
        (F.floor(last_tok / ctx_len) - F.floor(F.col("begin_offset") / ctx_len) + 1)
        .alias("n_seqs"),
    )


def shard_manifest(packed: DataFrame, ctx_len: int) -> DataFrame:
    """Per-shard packing summary: total tokens, docs, number of full
    context windows produced and the tail remainder that a training
    loader would drop or pad. Pure second-stage agg on the packed
    output (reuses the shard partitioning — no extra wide shuffle)."""
    return packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.floor(F.sum("n_tokens") / ctx_len).alias("n_full_seqs"),
        (F.sum("n_tokens") % ctx_len).alias("tail_tokens"),
    )
