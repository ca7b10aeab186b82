"""As-of join — reference J5: "latest price with price_ts < t"
(db.py:331-344, used by swap_volume.py:73-111, price_discovery.py:69-82).

Spark has no native ASOF JOIN; the classic scalable construction is
union + keyed window + last_value(ignoreNulls):

    left  rows (need a value as of their ts)   tagged _side=1
    right rows (carry the value, at their ts)  tagged _side=0
    union -> window partitioned by join key, ordered by (ts, _side)
    last(value, ignorenulls=True) over rows unbounded preceding..current
    keep left rows.

One shuffle on the key, no range explosion, skew handled by AQE. The
`_side` ordering makes a right row at exactly ts==t visible or not:
strict=True reproduces the reference's `price_ts < t`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right-side `value_cols`
    with right_ts < left_ts (<= when strict=False), per `on` key."""
    # right rows sort before left rows at the same timestamp iff
    # non-strict (value at ts==t visible)
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lhs = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(l_tag)
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(r_tag).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    for c in value_cols:
        lhs = lhs.withColumn(f"_v_{c}", F.lit(None).cast(rhs.schema[f"_v_{c}"].dataType))
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    is_left = F.col("_side") == F.lit(l_tag)
    out = filled.filter(is_left)
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"_asof_{c}")).drop(
            f"_v_{c}", f"_asof_{c}"
        )
    return out.drop("_ts", "_side")
