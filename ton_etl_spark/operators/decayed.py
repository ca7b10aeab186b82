"""Exponentially time-decayed weighted average — reference A1:
`agg_prices` recomputes, for every window, sum(price * w * vol)/sum(w *
vol) with w = 2^(-(t_end - ts)/1800) over the trailing 1800 s
(db.py:447-470, triggered by price_discovery.py:100).

Expressed as a tumbling-window aggregation: pure column expressions
inside one hash aggregate (map-side combine, whole-stage codegen), no
UDF."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def time_decayed_avg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,              # epoch seconds (long/double)
    value_col: str,
    weight_col: Column | None = None,
    window_s: int = 1800,
    half_life_s: int = 1800,
) -> DataFrame:
    """Per key and per tumbling window of `window_s` seconds: the
    decayed weighted mean of `value_col`, decay anchored at window end.

    Output: keys + window_start (epoch s) + decayed_avg + n_obs.
    """
    wstart = (F.floor(F.col(ts_col) / window_s) * window_s).cast("long")
    wend = wstart + F.lit(window_s)
    decay = F.pow(F.lit(2.0), -(wend - F.col(ts_col)) / F.lit(float(half_life_s)))
    w = decay if weight_col is None else decay * weight_col
    return (
        df.withColumn("_w", w)
        .withColumn("window_start", wstart)
        .groupBy(*keys, "window_start")
        .agg(
            (F.sum(F.col(value_col) * F.col("_w")) / F.sum("_w")).alias(
                "decayed_avg"
            ),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
