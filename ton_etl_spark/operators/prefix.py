"""Scalable prefix sums (cumulative aggregates) without the
single-partition window trap.

`SUM(v) OVER (ORDER BY k)` — the global running total — is the one
window shape Spark executes on ONE task: no PARTITION BY means
`Exchange SinglePartition`, so a 100 TB cumsum funnels through a
single executor core. Same trap per key when PARTITION BY has low
cardinality (a handful of domains): each domain is one task.

This module computes the identical result in three scalable steps —
the classic distributed prefix-sum decomposition:

  1. bucket each row by WHERE ITS ORDER KEY FALLS among B quantile cut
     points (a pure codegen'd expression of the row's value — NOT of
     the physical partitioning, so the result is partition-count- and
     cluster-size-independent by construction);
  2. one tiny aggregation: per (partition key, bucket) totals
     (B × |keys| rows, map-side combined), exclusive-prefixed on the
     driver into per-bucket offsets;
  3. a window WITHIN each (partition key, bucket) — max task size
     ~ |key| / B rows — plus the broadcast offset.

Semantics match the SQL default frame exactly: RANGE BETWEEN
UNBOUNDED PRECEDING AND CURRENT ROW, i.e. ties on the order key share
one cumulative value (both Spark and DuckDB default to RANGE when an
ORDER BY is present). Equal order keys always land in the same bucket
(cut comparison is `<=`), so tie groups never straddle a boundary.

Exactness contract: with an INTEGRAL value column the result is
bit-identical at any parallelism (long addition is associative); for
doubles quantize to fixed-point first (the repo-wide rule — see
operators/sessions.py). Cut points come from approxQuantile and only
steer load balance, never the answer.

Reference parity note: the reference has no cumulative operator — this
backs the training-data curation path (token-budget mixes over quality
ranks), where per-source running token totals over ~10^10 documents
are exactly the low-cardinality-key case the naive window cannot run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Bound on the driver-side (key × bucket) totals collect. Loud failure,
# never a silent cap (repo rule: no silent driver blowups) — above this
# the partition keys are high-cardinality enough that the PLAIN
# per-key window is already scalable and should be used instead.
MAX_OFFSET_ROWS = 100_000


def order_cuts(df: DataFrame, order_col: str, buckets: int) -> list[float]:
    """B-quantile cut points of a NUMERIC order column (one extra scan;
    at query-of-record scale reuse cached table statistics instead).
    Deduplicated: heavy ties collapse buckets rather than split them."""
    if buckets < 2:
        return []
    qs = [i / buckets for i in range(1, buckets)]
    cuts = df.stat.approxQuantile(order_col, qs, 0.001)
    return sorted(set(cuts))


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str | list[str],
    out_col: str | list[str],
    partition_cols: list[str] | None = None,
    descending: bool = False,
    buckets: int = 64,
    cuts: list[float] | None = None,
    persist_input: bool = False,
    persisted: list | None = None,
) -> DataFrame:
    """df + `out_col` = SUM(value_col) OVER (PARTITION BY partition_cols
    ORDER BY order_col [DESC]) with the default RANGE frame — computed
    without any single-partition (or single-task-per-key) exchange.

    `value_col`/`out_col` may be parallel LISTS to compute several
    running sums in ONE pass (same cuts, same offset agg, same window).

    `order_col` must be numeric and non-null; `value_col` should be
    integral for cross-engine/cross-parallelism exactness (see module
    docstring).

    NULL handling matches the naive window EXACTLY (r4 ADVICE items
    closed): partition keys may be NULL (the offset join is null-safe,
    `<=>`, so SQL's NULL-is-one-partition window semantics hold), and a
    NULL-valued prefix behaves like SQL SUM — the running total is NULL
    until the first non-null value, then carries across buckets even
    when a whole bucket head is NULL (tracked via a running non-null
    count, not by coalescing sums to 0).

    `persist_input=True` caches `df` across the operator's three
    actions (quantile cuts, offset totals, the result's own jobs) —
    essential when the input columns are expensive per-row derivations
    (regex token counts, quality scores): without it every pass re-runs
    the derivation from the scan. The cached frame should be NARROW
    (ids + the order/value columns only). Lifecycle: pass a list as
    `persisted` and the cached handle is appended for the caller to
    `.unpersist()` once the result is materialized; otherwise eviction
    is LRU via Spark's ContextCleaner when the frame goes out of
    scope (storage level MEMORY_AND_DISK, so worst case is disk, not
    OOM)."""
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vcols) != len(ocols):
        raise ValueError("value_col and out_col must be the same length")
    pcols = list(partition_cols or [])
    if persist_input:
        df = df.persist()
        if persisted is not None:
            persisted.append(df)
    if cuts is None:
        cuts = order_cuts(df, order_col, buckets)
    oc = F.col(order_col).cast("double")
    if cuts:
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        # bucket = #cuts <= key: equal keys always share a bucket, so a
        # RANGE-frame tie group can never straddle a bucket boundary
        qb = F.size(F.filter(arr, lambda c: c <= oc))
    else:
        qb = F.lit(0)
    b = df.withColumn("_qb", qb.cast("int"))

    totals = (
        b.groupBy(*pcols, "_qb")
        .agg(
            *[F.sum(v).alias(f"_t{i}") for i, v in enumerate(vcols)],
            # non-null count per value column: lets the final expression
            # reproduce SQL SUM's NULL semantics exactly (NULL until the
            # first non-null, then a carried total) across bucket
            # boundaries — see NULL handling in the docstring
            *[F.count(v).alias(f"_n{i}") for i, v in enumerate(vcols)],
        )
        .collect()
    )
    if len(totals) > MAX_OFFSET_ROWS:
        raise RuntimeError(
            f"bucketed_cumsum: {len(totals)} (key, bucket) groups exceed "
            f"the driver offset bound {MAX_OFFSET_ROWS}; the partition "
            "keys are high-cardinality — use a plain per-key window"
        )
    # Exclusive prefix per partition key, walking buckets in cumsum
    # direction (ascending order key -> ascending bucket, and vice
    # versa). O(keys x buckets) driver work on a bounded list.
    by_key: dict[tuple, list] = {}
    for r in totals:
        by_key.setdefault(tuple(r[c] for c in pcols), []).append(r)
    offset_rows = []
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r["_qb"], reverse=descending)
        run = [0] * len(vcols)
        runc = [0] * len(vcols)
        for r in rows:
            offset_rows.append((*key, r["_qb"], *run, *runc))
            for i in range(len(vcols)):
                run[i] += r[f"_t{i}"] or 0
                runc[i] += r[f"_n{i}"]
    spark = df.sparkSession
    off_schema = b.select(*pcols, "_qb").schema
    for i in range(len(vcols)):
        off_schema = off_schema.add(f"_off{i}", "long")
    for i in range(len(vcols)):
        off_schema = off_schema.add(f"_offn{i}", "long")
    off = spark.createDataFrame(offset_rows, off_schema)

    w = W.partitionBy(*pcols, "_qb").orderBy(
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    # Null-safe (<=>) offset join: SQL window PARTITION BY treats NULL as
    # one partition, and groupBy above groups NULL keys together — a
    # plain equi-join would silently drop those offsets (r4 ADVICE).
    # Still a broadcast hash join: <=> is a supported hash-join key.
    acols = [f"_off{i}" for i in range(len(vcols))] + [
        f"_offn{i}" for i in range(len(vcols))
    ]
    offa = off.select(
        *[F.col(c).alias(f"_k{j}") for j, c in enumerate(pcols)],
        F.col("_qb").alias("_qbo"),
        *acols,
    )
    cond = F.col("_qb") == F.col("_qbo")
    for j, c in enumerate(pcols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"_k{j}"))
    out = b.join(F.broadcast(offa), cond, "left")
    for i, (v, o) in enumerate(zip(vcols, ocols)):
        # default frame with orderBy = RANGE UNBOUNDED PRECEDING..CURRENT
        # ROW. Non-null-seen-so-far = within-bucket count + carried
        # count; while it is 0 the SQL running SUM is NULL, afterwards
        # NULL bucket heads coalesce to 0 so the carried total persists.
        seen = F.count(v).over(w) + F.coalesce(F.col(f"_offn{i}"), F.lit(0))
        out = out.withColumn(
            o,
            F.when(
                seen > 0,
                F.coalesce(F.sum(v).over(w), F.lit(0))
                + F.coalesce(F.col(f"_off{i}"), F.lit(0)),
            ),
        )
    return out.drop(
        "_qb", "_qbo",
        *[f"_k{j}" for j in range(len(pcols))],
        *acols,
    )


def token_budget_mix(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    budget,
    buckets: int = 32,
    persisted: list | None = None,
) -> DataFrame:
    """Quality-greedy token-budget selection — the data-recipe builder:
    per domain, rank documents by quality score (descending) and keep
    them until the domain's token budget is filled (a document is kept
    iff the running token total THROUGH it fits the budget).

    `budget` is a single int or a {domain: int} dict; domains absent
    from the dict get 0 (keep nothing). Quality ties share one running
    total (RANGE semantics), so a tie group is kept or cut atomically —
    deterministic at any parallelism, no arbitrary intra-tie order.

    -> (id, domain, quality, n_tokens, cum_tokens), exactly the rows
    that fit. Scale shape: one quantile scan + one tiny agg + one
    window whose tasks are ~ domain/|buckets| sized — no per-domain
    single task (see module docstring).
    """
    from .text import quality_score, token_count

    m = docs.select(
        F.col(id_col),
        F.col(domain_col),
        F.round(quality_score(F.col(text_col)), 6).alias("quality"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    cum = bucketed_cumsum(
        m, "quality", "n_tokens", "cum_tokens",
        partition_cols=[domain_col], descending=True, buckets=buckets,
        # m is 4 narrow columns but costs a regex tokenization pipeline
        # per row — compute it once, not once per cumsum action; pass a
        # `persisted` list to reclaim the cache after materializing
        persist_input=True,
        persisted=persisted,
    )
    if isinstance(budget, dict):
        pairs = [x for d, v in sorted(budget.items()) for x in (F.lit(d), F.lit(int(v)))]
        limit = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(domain_col)), F.lit(0)
        )
    else:
        limit = F.lit(int(budget))
    # re-select: the offset equi-join moved the join keys (domain) first
    return cum.filter(F.col("cum_tokens") <= limit).select(
        id_col, domain_col, "quality", "n_tokens", "cum_tokens"
    )
