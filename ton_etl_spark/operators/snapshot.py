"""Latest-state snapshot (rank-1 dedup) — reference K7/A2:
`row_number() over (partition by address order by update_time desc) = 1`
(datalake/metadata_snapshot.py:93-105, athena_ddl.sql:452-462)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_state(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    descending: bool = True,
) -> DataFrame:
    """One row per key: the latest by `order_cols` (ties broken by the
    full order column list, so the result is deterministic).

    Scale note: row_number over a key-partitioned window is a single
    hash shuffle on the keys; with AQE skew handling on, a hot key is
    split across reducers only for the sort — for massively hot keys
    prefer the max(struct(...)) formulation in lake/merge.py which gets
    map-side partial aggregation.
    """
    ordering = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_cols
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
