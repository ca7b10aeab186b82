"""Gap-based session windows (batch): the gaps-and-islands pattern as
two window functions + one aggregation.

A session is a maximal run of a key's events where consecutive events
are at most `gap_s` seconds apart. Batch semantics are fully
SQL-expressible (lag -> new-session flag -> running sum -> groupBy),
which makes this the oracle-checkable twin of the streaming operator
in `streaming/sessions.py` (applyInPandasWithState); a parity test
holds the two to identical output.

Scale shape: one shuffle on the key for the windows, the aggregation
reuses the same partitioning (no second exchange); no Python anywhere.
Timestamps are floored to epoch seconds on entry so both engines (and
the streaming twin) make identical gap decisions regardless of
sub-second parts and timezone rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def session_windows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int,
    value_col: str | None = None,
) -> DataFrame:
    """-> (key, session_id, session_start_s, session_end_s, n_events
    [, total_value]); session_id is the key-local ordinal (1-based, in
    time order)."""
    es = F.unix_timestamp(F.col(ts_col))
    w = W.partitionBy(key_col).orderBy(es)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag(es).over(w)
    is_new = (prev.isNull() | ((es - prev) > gap_s)).cast("long")
    # Fixed-point micro-units: a raw double SUM is summation-order- (and
    # therefore partitioning-) dependent — a 1-ulp tie at the 6th decimal
    # can flip between cluster sizes. Integer addition is associative, so
    # quantizing each value to round(v * 1e6) BEFORE the sum makes the
    # aggregate bit-identical at any parallelism (same trick as
    # queries.q_curation_pipeline's avg_quality).
    q6 = F.round(F.col(value_col) * F.lit(1000000.0)).cast("long") if value_col else None
    sess = df.select(
        F.col(key_col),
        es.alias("_es"),
        F.sum(is_new).over(run).alias("session_id"),
        *([q6.alias("_v6")] if value_col else []),
    )
    aggs = [
        F.min("_es").alias("session_start_s"),
        F.max("_es").alias("session_end_s"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.round(F.sum("_v6") / F.lit(1000000.0), 6).alias("total_value")
        )
    return sess.groupBy(key_col, "session_id").agg(*aggs)
