"""Bucketized interval join (operators/rangejoin.py): equivalence to
the naive nested-loop semantics, boundary rules, key scoping, the
whale-interval loud bound, and the no-nested-loop plan shape."""

import pytest
from pyspark.sql import Row, functions as F

from ton_etl_spark.operators.rangejoin import interval_join

POINTS = [Row(pid=i, ts=float(100 + 37 * i % 900), k=i % 2) for i in range(60)]
IVALS = [
    Row(iid=j, s=float(80 + 90 * j), e=float(80 + 90 * j + 25 * (1 + j % 3)),
        k=j % 2)
    for j in range(10)
]


def _naive(spark, bounds="[)", keyed=False):
    p, v = spark.createDataFrame(POINTS), spark.createDataFrame(IVALS)
    upper = (F.col("ts") <= F.col("e")) if bounds == "[]" else (
        F.col("ts") < F.col("e")
    )
    cond = (F.col("ts") >= F.col("s")) & upper
    if keyed:
        cond = cond & (p["k"] == v["k"])
    return sorted(
        (r["pid"], r["iid"])
        for r in p.join(v.drop("k") if not keyed else v, cond).collect()
    )


def _bucketized(spark, bounds="[)", keyed=False, bucket_s=40):
    p, v = spark.createDataFrame(POINTS), spark.createDataFrame(IVALS)
    out = interval_join(
        p, v if keyed else v.drop("k"), "ts", "s", "e", bucket_s,
        keys=("k",) if keyed else (), bounds=bounds,
    )
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_matches_naive_join(spark):
    assert _bucketized(spark) == _naive(spark)
    assert len(_bucketized(spark)) > 0


def test_bounds_inclusive_end(spark):
    half_open = _bucketized(spark, bounds="[)")
    closed = _bucketized(spark, bounds="[]")
    assert closed == _naive(spark, bounds="[]")
    assert set(half_open) <= set(closed)


def test_exact_boundary_points(spark):
    p = spark.createDataFrame([Row(pid=0, ts=10.0), Row(pid=1, ts=20.0)])
    v = spark.createDataFrame([Row(iid=7, s=10.0, e=20.0)])
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(p, v, "ts", "s", "e", 8).collect()
    }
    assert got == {(0, 7)}  # start inclusive, end exclusive
    got2 = {
        (r["pid"], r["iid"])
        for r in interval_join(p, v, "ts", "s", "e", 8, bounds="[]").collect()
    }
    assert got2 == {(0, 7), (1, 7)}


def test_keys_scope_the_join(spark):
    assert _bucketized(spark, keyed=True) == _naive(spark, keyed=True)


def test_bucket_size_invariance(spark):
    assert (
        _bucketized(spark, bucket_s=7)
        == _bucketized(spark, bucket_s=40)
        == _bucketized(spark, bucket_s=1000)
    )


def test_empty_and_inverted_intervals_match_nothing(spark):
    p = spark.createDataFrame([Row(pid=0, ts=50.0)])
    v = spark.createDataFrame(
        [Row(iid=0, s=50.0, e=50.0), Row(iid=1, s=60.0, e=40.0)]
    )
    assert interval_join(p, v, "ts", "s", "e", 10).count() == 0


def test_whale_interval_fails_loudly(spark):
    p = spark.createDataFrame([Row(pid=0, ts=5.0)])
    v = spark.createDataFrame([Row(iid=0, s=0.0, e=1e9)])
    with pytest.raises(Exception, match="interval_join: interval covers"):
        interval_join(
            p, v, "ts", "s", "e", 10, max_buckets_per_interval=1000
        ).count()


def test_plan_has_no_nested_loop(spark):
    p, v = spark.createDataFrame(POINTS), spark.createDataFrame(IVALS)
    plan = (
        interval_join(p, v.drop("k"), "ts", "s", "e", 40)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
