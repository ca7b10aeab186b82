"""Watermarked tumbling-window rollup — the canonical Structured
Streaming aggregation (`withWatermark` -> `window()` groupBy ->
append-mode emit on window close), plus its batch twin through the
SAME function so parity is by construction, not by re-implementation.

Reference parity: the reference maintains time-bucketed aggregate
marts by periodically re-running GROUP BY day queries over exported
data (re-doubt/ton-etl README.md:240-257, datamart layer); here the
same rollup is a continuous streaming aggregate that emits each
(window, key) row exactly once, when the event-time watermark passes
the window end.

Scale shape: the whole plan is JVM-side built-ins — `window()` is a
generator expression, the aggregate does map-side partial combine,
and the only shuffle is on (window, key). Streaming state is one
aggregation buffer per OPEN (window, key), evicted at watermark —
bounded by (keys x windows-in-flight), independent of event count.
Late rows past the watermark are dropped by the engine (the append
contract); the batch twin over the same non-late rows is identical,
which tests/test_streaming_windows.py holds as an invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start_s, key, n_events, sum_value) per tumbling window.

    Works on a batch OR streaming DataFrame: streaming input gets the
    watermark and emits closed windows in append mode; batch input
    runs the identical aggregate in one pass.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_len).alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("win.start").alias("window_start_s"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
