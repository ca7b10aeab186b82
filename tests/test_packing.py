"""Sequence packing (operators/packing.py) and repetition metrics
(operators/text.py) — unit semantics vs a pure-Python reference, edge
cases, and plan shape (exactly one shuffle for packing, zero for the
repetition column expressions)."""

import pytest
from pyspark.sql import Row, functions as F

from ton_etl_spark.operators.packing import pack_sequences, shard_manifest
from ton_etl_spark.operators.text import repetition_metrics


def _py_pack(docs, ctx):
    """Reference: per shard, lay docs out in id order, chunk by ctx."""
    out = {}
    by_shard = {}
    for doc_id, shard, n in sorted(docs):
        by_shard.setdefault(shard, []).append((doc_id, n))
    for shard, items in by_shard.items():
        off = 0
        for doc_id, n in items:
            last = off + max(n - 1, 0)
            out[doc_id] = (
                shard, n, off, off // ctx, last // ctx,
                last // ctx - off // ctx + 1,
            )
            off += n
    return out


DOCS = [
    # (doc_id, shard, n_tokens) — spans chosen to cross ctx=10 borders
    (1, 0, 4), (2, 0, 7), (3, 0, 25), (4, 0, 0), (5, 0, 10),
    (10, 1, 10), (11, 1, 1), (12, 1, 9), (13, 1, 30),
]


@pytest.fixture(scope="module")
def packed(spark):
    df = spark.createDataFrame(
        [Row(doc_id=d, shard=s, n_tokens=n) for d, s, n in DOCS]
    )
    return pack_sequences(
        df, ctx_len=10, tokens_col="n_tokens", shard_col="shard"
    )


def test_pack_matches_python_reference(packed):
    ref = _py_pack(DOCS, 10)
    got = {r["doc_id"]: r for r in packed.collect()}
    assert set(got) == set(ref)
    for doc_id, (shard, n, off, fs, ls, nseq) in ref.items():
        r = got[doc_id]
        assert (
            r["shard"], r["n_tokens"], r["begin_offset"],
            r["first_seq"], r["last_seq"], r["n_seqs"],
        ) == (shard, n, off, fs, ls, nseq), doc_id


def test_pack_zero_token_doc_clamped(packed):
    r = packed.filter("doc_id = 4").first()
    # empty doc occupies no tokens but still lands in a well-formed
    # single window (last_seq == first_seq, n_seqs == 1)
    assert r["n_seqs"] == 1 and r["last_seq"] == r["first_seq"]


def test_pack_boundary_spanning(packed):
    # doc 3: begin=11, last=35 at ctx 10 -> windows 1..3
    r = packed.filter("doc_id = 3").first()
    assert (r["first_seq"], r["last_seq"], r["n_seqs"]) == (1, 3, 3)


def test_shards_independent(spark):
    """Adding docs to one shard never moves another shard's offsets."""
    base = spark.createDataFrame(
        [Row(doc_id=d, shard=s, n_tokens=n) for d, s, n in DOCS]
    )
    more = base.union(
        spark.createDataFrame([Row(doc_id=99, shard=1, n_tokens=1000)])
    )
    a = {
        r["doc_id"]: r["begin_offset"]
        for r in pack_sequences(
            base, 10, tokens_col="n_tokens", shard_col="shard"
        ).collect()
        if r["shard"] == 0
    }
    b = {
        r["doc_id"]: r["begin_offset"]
        for r in pack_sequences(
            more, 10, tokens_col="n_tokens", shard_col="shard"
        ).collect()
        if r["shard"] == 0
    }
    assert a == b


def test_default_shard_and_manifest(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tokens=i % 7 + 1) for i in range(100)]
    )
    p = pack_sequences(df, ctx_len=16, n_shards=4)
    assert p.select("shard").distinct().count() == 4
    m = {r["shard"]: r for r in shard_manifest(p, 16).collect()}
    tot = p.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
    for r in tot:
        mr = m[r["shard"]]
        assert mr["total_tokens"] == r["t"]
        assert mr["n_full_seqs"] == r["t"] // 16
        assert mr["tail_tokens"] == r["t"] % 16
        # manifest is consistent with the per-doc layout: the last
        # window index per shard is the window holding token total-1
        last = (
            p.filter(F.col("shard") == r["shard"])
            .agg(F.max("last_seq"))
            .first()[0]
        )
        assert last == (r["t"] - 1) // 16


def test_pack_single_shuffle_plan(spark):
    # fresh plan (the shared fixture may have been AQE-finalized by an
    # earlier collect, which reprints exchanges as ShuffleQueryStages)
    df = spark.createDataFrame(
        [Row(doc_id=d, shard=s, n_tokens=n) for d, s, n in DOCS]
    )
    p = pack_sequences(df, ctx_len=10, tokens_col="n_tokens", shard_col="shard")
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") == 1, plan


def test_pack_rejects_bad_ctx(spark):
    df = spark.createDataFrame([Row(doc_id=1, n_tokens=3)])
    with pytest.raises(ValueError):
        pack_sequences(df, ctx_len=0)


# ---- repetition metrics ----------------------------------------------


def test_repetition_metrics_known_values(spark):
    rows = [
        Row(doc_id=1, text="a a a a"),          # one token repeated
        Row(doc_id=2, text="a b c d"),          # all distinct
        Row(doc_id=3, text="x y x y x y"),      # dominant bigram
        Row(doc_id=4, text="Solo"),             # single token
    ]
    m = {
        r["doc_id"]: r
        for r in repetition_metrics(
            spark.createDataFrame(rows), "doc_id", "text"
        ).collect()
    }
    r = m[1]
    assert (r["n_tokens"], r["n_distinct"], r["top_word_count"]) == (4, 1, 4)
    assert r["dup_word_frac"] == 0.75 and r["top_word_frac"] == 1.0
    # bigrams of "a a a a": ["a a"] x3
    assert r["top_bigram_count"] == 3 and r["top_bigram_frac"] == 1.5
    r = m[2]
    assert r["dup_word_frac"] == 0.0 and r["top_word_count"] == 1
    assert r["top_bigram_count"] == 1 and r["top_bigram_frac"] == 0.5
    r = m[3]
    # "x y" appears 3 times among the 5 bigrams of 6 tokens: 2*3/6
    assert r["top_bigram_count"] == 3 and r["top_bigram_frac"] == 1.0
    r = m[4]  # lowercased; no bigrams at all
    assert (r["n_tokens"], r["top_word_count"], r["top_bigram_count"]) == (
        1, 1, 0,
    )
    assert r["top_bigram_frac"] == 0.0


def test_repetition_no_shuffle(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    plan = (
        repetition_metrics(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "exchange" not in plan.lower(), plan
