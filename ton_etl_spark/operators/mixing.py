"""Corpus mixing: deterministically downsample groups (sources,
languages, domains) to target mixture weights — the data-mixing step
every pretraining pipeline runs (the Pile / LLaMA-style mixture
tables; public papers).

Semantics (downsample-only, no duplication): weights are INTEGER parts
(e.g. {"en": 50, "de": 15, ...}, parts of their sum). The feasible
mixed-corpus size is

    T = min over groups of floor(n_g * total_parts / w_g)

and each group contributes quota_g = floor(T * w_g / total_parts)
documents — the largest corpus with the requested proportions that no
group can't fill. All quota arithmetic is INTEGER (BIGINT div), so
Spark and the SQL oracle agree bit-for-bit with no float-rounding edge.

A group named in `weights` but absent from the data contributes no
count row and is ignored by the feasibility min — the mixture is over
the groups actually present (checked by the manifest's n_total column;
a pipeline that requires all groups present should assert on it).

Within each group the kept documents are the quota_g with the smallest
sha256(salt || id) — the same reproducible, partitioning-independent,
engine-portable selection as operators.sampling (same salt => same
corpus forever; a different salt => an independent draw).

Scale shape: one count aggregation (tiny result), the single-row
feasible-T reduce, a broadcast of the per-group quota dim, and one
window shuffle partitioned by the group column. With few groups and
10^9+ rows/group the per-group window sort is the bottleneck — the
scale path is a two-phase select (approx hash-quantile per group to
pre-filter to ~quota survivors at the scan, then the exact rank on the
survivors); not implemented here, the exact rank IS the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _quotas(
    df: DataFrame, group_col: str, weights: dict[str, int]
) -> DataFrame:
    """Per-group quota dim: (group, n_total, quota). Integer math only."""
    total_parts = sum(weights.values())
    if total_parts <= 0 or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive integers: {weights}")
    if any(not isinstance(w, int) for w in weights.values()):
        raise ValueError(f"weights must be INTEGER parts: {weights}")
    w_item = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    counts = (
        df.filter(F.col(group_col).isin(list(weights)))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        .withColumn("parts", w_item[F.col(group_col)].cast("long"))
    )
    # feasible corpus size: single-row reduce, then broadcast back
    feas = counts.select(
        F.min(F.expr(f"(n_total * {total_parts}L) div parts")).alias("t_max")
    )
    return (
        counts.crossJoin(F.broadcast(feas))
        .withColumn(
            "quota",
            F.expr(f"(t_max * parts) div {total_parts}L").cast("long"),
        )
        .select(group_col, "n_total", "quota")
    )


def mix_corpus(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict[str, int],
    salt: str = "mix-v1",
) -> DataFrame:
    """The mixed corpus: input rows (all columns) of the groups named in
    `weights`, downsampled to quota_g per group by smallest
    sha256(salt || id). Groups absent from `weights` are dropped."""
    q = _quotas(df, group_col, weights)
    h = F.sha2(F.concat(F.lit(salt), F.col(id_col).cast("string")), 256)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.filter(F.col(group_col).isin(list(weights)))
        .join(F.broadcast(q.select(group_col, "quota")), group_col)
        .withColumn("_mix_rn", F.row_number().over(w))
        .filter(F.col("_mix_rn") <= F.col("quota"))
        .drop("_mix_rn", "quota")
    )


def mix_manifest(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict[str, int],
    salt: str = "mix-v1",
) -> DataFrame:
    """Audit view: per group, available docs, quota, docs actually kept
    and an id-sum checksum of the kept set (verifies the SELECTION, not
    just its size)."""
    kept = mix_corpus(df, group_col, id_col, weights, salt)
    agg = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum(F.col(id_col).cast("long")).alias("sum_ids"),
    )
    return (
        _quotas(df, group_col, weights)
        .join(agg, group_col, "left")
        .select(
            group_col,
            "n_total",
            "quota",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("sum_ids"), F.lit(0)).cast("long").alias("sum_ids"),
        )
    )
