"""bucketed_cumsum / token_budget_mix: the distributed prefix-sum must
equal the naive single-partition window bit-for-bit, at any input
partitioning, and must never plan a SinglePartition exchange."""

import pytest
from pyspark.sql import Window as W, functions as F

from ton_etl_spark.operators import prefix
from ton_etl_spark.operators.prefix import bucketed_cumsum, token_budget_mix


def _data(spark, n=997, parts=7):
    # deterministic, skewed, with heavy order-key ties (k has ~n/10
    # distinct values) so the RANGE tie semantics are actually exercised
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id"),
            (F.col("id") % 10).alias("dom"),
            ((F.col("id") * 2654435761) % 97).alias("k"),
            ((F.col("id") * 48271) % 1000 - 500).alias("v"),
        )
    )


def _naive(df, pcols, order_col, value_col, descending):
    o = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = W.partitionBy(*pcols).orderBy(o)  # default RANGE frame
    return df.withColumn("cum", F.sum(value_col).over(w))


@pytest.mark.parametrize("pcols,descending", [
    ([], False), ([], True), (["dom"], False), (["dom"], True),
])
def test_matches_naive_window(spark, pcols, descending):
    df = _data(spark)
    got = bucketed_cumsum(
        df, "k", "v", "cum", partition_cols=pcols,
        descending=descending, buckets=8,
    )
    want = _naive(df, pcols, "k", "v", descending)
    cols = ["id", "dom", "k", "v", "cum"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_multi_value_columns_one_pass(spark):
    # parallel value/out lists: each output equals its own naive window
    df = _data(spark).withColumn("one", F.lit(1).cast("long"))
    got = bucketed_cumsum(
        df, "k", ["v", "one"], ["cum_v", "cum_n"],
        partition_cols=["dom"], buckets=8,
    )
    want = _naive(
        _naive(df, ["dom"], "k", "v", False).withColumnRenamed("cum", "cum_v"),
        ["dom"], "k", "one", False,
    ).withColumnRenamed("cum", "cum_n")
    cols = ["id", "cum_v", "cum_n"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_partitioning_independent(spark):
    # same rows, different physical layout -> identical cumsum (the
    # bucket is a function of the VALUE, never of the partitioning)
    a = bucketed_cumsum(_data(spark, parts=2), "k", "v", "cum", buckets=8)
    b = bucketed_cumsum(_data(spark, parts=13), "k", "v", "cum", buckets=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ties_share_running_total(spark):
    # RANGE default frame: all rows with an equal order key carry the
    # SAME cumulative value (= total through the whole tie group)
    df = spark.createDataFrame(
        [(1, 5, 10), (2, 5, 20), (3, 7, 1)], "id long, k long, v long"
    )
    out = {r["id"]: r["cum"]
           for r in bucketed_cumsum(df, "k", "v", "cum", buckets=4).collect()}
    assert out[1] == out[2] == 30 and out[3] == 31


def test_no_single_partition_exchange(spark):
    plan = (
        bucketed_cumsum(_data(spark), "k", "v", "cum", buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    # and the naive global window DOES plan one (the trap is real)
    naive = (
        _naive(_data(spark), [], "k", "v", False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" in naive


def test_offset_bound_fails_loudly(spark, monkeypatch):
    monkeypatch.setattr(prefix, "MAX_OFFSET_ROWS", 3)
    with pytest.raises(RuntimeError, match="driver offset bound"):
        bucketed_cumsum(_data(spark), "k", "v", "cum", buckets=8)


def test_null_partition_keys_match_naive(spark):
    # SQL window PARTITION BY puts NULL keys in one partition; the
    # offset join must be null-safe or their offsets vanish (r4 ADVICE)
    rows = [(1, None, 1, 10), (2, None, 2, 20), (3, None, 3, 30),
            (4, "a", 1, 5), (5, "a", 2, 7), (6, None, 4, 1)]
    df = spark.createDataFrame(rows, "id long, dom string, k long, v long")
    got = bucketed_cumsum(
        df, "k", "v", "cum", partition_cols=["dom"], buckets=3
    )
    want = _naive(df, ["dom"], "k", "v", False)
    cols = ["id", "dom", "k", "v", "cum"]
    assert sorted(map(tuple, got.select(cols).collect()), key=str) == sorted(
        map(tuple, want.select(cols).collect()), key=str
    )


def test_null_values_carry_and_null_prefix(spark):
    # SQL SUM semantics: NULL until the first non-null value, then the
    # carried total persists across a bucket whose head is all-NULL
    # (r4 ADVICE: coalescing alone would break the all-null prefix)
    rows = [(i, i, None if i in (0, 1, 5, 6) else 10) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    # buckets chosen so a bucket starts inside the NULL run at k=5,6
    got = bucketed_cumsum(df, "k", "v", "cum", cuts=[2.0, 4.5])
    want = _naive(df, [], "k", "v", False)
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )
    by_id = {r["id"]: r["cum"] for r in got.collect()}
    assert by_id[0] is None and by_id[1] is None  # all-null prefix
    assert by_id[5] == by_id[6] == 30             # carry through NULL head


def test_persisted_handle_lifecycle(spark):
    # persist_input + persisted=[] returns the cached handle so a
    # long-lived session can unpersist once materialized (r4 ADVICE)
    handles = []
    out = bucketed_cumsum(
        _data(spark, n=100), "k", "v", "cum",
        buckets=4, persist_input=True, persisted=handles,
    )
    assert len(handles) == 1 and handles[0].is_cached
    out.count()
    handles[0].unpersist()
    assert not handles[0].is_cached


def test_token_budget_dict_and_atomic_ties(spark):
    rows = [
        # domain a: quality ties -> the (d2, d3) tie group must be kept
        # or cut ATOMICALLY; with budget 12 it fits (4+4+4=12)
        (1, "a", "w w w w w w w w w w w w w w w w w w w w w w w w"),
        (2, "a", "x y z q"),
        (3, "a", "q z y x"),
        # domain b present in data, absent from the budget dict -> 0 kept
        (4, "b", "a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = token_budget_mix(
        df, "doc_id", "text", "source", {"a": 36}, buckets=4
    )
    got = {r["doc_id"]: r["cum_tokens"] for r in kept.collect()}
    assert set(got) == {1, 2, 3}
    # doc 1 (24 tokens, highest quality) first; tie group 2,3 shares 32
    assert got[1] == 24 and got[2] == got[3] == 32
    # shrinking the budget below the tie group's total cuts BOTH
    kept2 = token_budget_mix(
        df, "doc_id", "text", "source", {"a": 31}, buckets=4
    )
    assert {r["doc_id"] for r in kept2.collect()} == {1}
