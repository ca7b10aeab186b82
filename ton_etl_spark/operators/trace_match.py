"""Grouped sequence pattern match — reference J6: Megaton swap
detection fetches all transfers of a trace_id, sorts by lt, and
pattern-checks the last 4 (megaton.py:34-92).

Generalized: per group, the ordered signature of the last-k events.
Two implementations with identical results:

  * `chain_signature` — pure DataFrame (collect sorted structs, slice,
    concat): whole-stage-codegen friendly, one shuffle;
  * `chain_signature_pandas` — `applyInPandas` session-style grouped
    UDF, the template for arbitrary imperative per-group logic that
    column expressions can't express (the reference's chain matcher
    does field-by-field conditional checks).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def chain_signature(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    label_col: str,
    k: int = 4,
) -> DataFrame:
    """group_col -> `chain` = ','-joined labels of the last k events in
    (order_cols) order."""
    ev = F.struct(*[F.col(c) for c in order_cols], F.col(label_col).alias("_l"))
    evs = F.col("_evs")
    lastk = F.when(F.size(evs) >= k, F.slice(evs, -k, k)).otherwise(evs)
    return (
        df.groupBy(group_col)
        .agg(F.sort_array(F.collect_list(ev)).alias("_evs"))
        .select(
            group_col,
            F.concat_ws(
                ",", F.transform(lastk, lambda s: s["_l"])
            ).alias("chain"),
        )
    )


def chain_signature_pandas(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    label_col: str,
    k: int = 4,
) -> DataFrame:
    """Same result via applyInPandas (imperative per-group template)."""
    gtype = df.schema[group_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(group_col, gtype),
            T.StructField("chain", T.StringType()),
        ]
    )

    def matcher(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        labels = pdf[label_col].tolist()[-k:]
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "chain": [",".join(labels)]}
        )

    return df.groupBy(group_col).applyInPandas(matcher, out_schema)
