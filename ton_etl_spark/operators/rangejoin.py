"""Bucketized interval (range) join: points to containing intervals.

Open-source Spark has no range-join physical strategy — a naive
`points JOIN intervals ON ts BETWEEN start AND end` has no equi-key,
so Catalyst plans BroadcastNestedLoopJoin (or a cartesian product):
O(|points| x |intervals|) compares and a single-task collapse at
scale. This operator is the standard bucketization rewrite (the same
idea as Databricks' range-join bins or KDB window joins): quantize
time into fixed buckets, explode each interval into the buckets it
covers, equi-join points on their bucket (plus any caller equi-keys),
then apply the EXACT containment predicate on the original
full-precision columns.

Correctness: for s <= t < e, floor(s) <= floor(t) <= floor(e), so a
point's bucket always lies in [bucket(start), bucket(end)] — the
bucket join is a strict superset of the true matches and the final
filter is exact (sub-second parts compared on the original values;
bucketing only ever sees whole seconds).

Scale shape: one shuffle of each side keyed by (keys..., bucket) —
fully distributed, no nested-loop anywhere (plan-asserted in tests).
Cost is (interval_len / bucket_s + 1) exploded rows per interval:
pick bucket_s near the TYPICAL interval length (p50–p95). A whale
interval would silently explode into millions of bucket rows, so
`max_buckets_per_interval` (default 10k) fails the job LOUDLY with
the offending count instead — the no-silent-blowups rule.

Reference analogue: none (the reference joins only on equality keys);
this generalizes J5's as-of join to containment semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_MAX_BUCKETS = 10_000


def _epoch(df: DataFrame, col: str) -> F.Column:
    """Full-precision epoch seconds as double — timestamp->double cast
    keeps sub-second parts (unlike unix_timestamp's truncation).
    TIMESTAMP_NTZ has no direct double cast; route it through
    timestamp_ltz (the session timezone is pinned to UTC in
    session.get_spark, so NTZ values are read as UTC — the same
    convention DuckDB's epoch() applies to naive timestamps).
    Numeric columns pass through."""
    c = F.col(col)
    if dict(df.dtypes)[col].startswith("timestamp"):
        c = c.cast("timestamp_ltz")
    return c.cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
    keys: tuple[str, ...] = (),
    bounds: str = "[)",
    max_buckets_per_interval: int | None = DEFAULT_MAX_BUCKETS,
) -> DataFrame:
    """Inner-join each point row to every interval row containing its
    timestamp: start <= ts < end (`bounds="[)"`, default) or
    start <= ts <= end (`bounds="[]"`). `keys` adds equality columns
    (same name both sides) to the join. Output: all point columns +
    the interval's non-key columns.
    """
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")

    p_es = _epoch(points, ts_col)
    s_es = _epoch(intervals, start_col)
    e_es = _epoch(intervals, end_col)

    b0 = F.floor(s_es / bucket_s).cast("long")
    b1 = F.floor(e_es / bucket_s).cast("long")
    n_buckets = b1 - b0 + 1
    if max_buckets_per_interval is not None:
        b1 = F.when(
            n_buckets > max_buckets_per_interval,
            F.raise_error(F.concat(
                F.lit("interval_join: interval covers "),
                n_buckets.cast("string"),
                F.lit(f" buckets (> {max_buckets_per_interval}); raise "
                      "bucket_s or max_buckets_per_interval"),
            )).cast("long"),
        ).otherwise(b1)
    # empty/inverted intervals contribute no bucket rows
    covered = F.when(b1 >= b0, F.sequence(b0, b1)).otherwise(
        F.array().cast("array<bigint>")
    )

    ikey = [F.col(k) for k in keys]
    iv = intervals.select(
        *ikey,
        *[F.col(c) for c in intervals.columns if c not in keys],
        F.explode(covered).alias("_bucket"),
    )
    pt = points.withColumn(
        "_bucket", F.floor(p_es / bucket_s).cast("long")
    )

    upper = (p_es <= e_es) if bounds == "[]" else (p_es < e_es)
    joined = pt.join(iv, on=[*keys, "_bucket"]).filter(
        (p_es >= s_es) & upper
    )
    return joined.drop("_bucket")
