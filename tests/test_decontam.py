"""Decontamination (operators/decontam.py): planted leakage is caught,
clean docs pass, short docs are well-formed, and the hashed-shingle
scale path agrees with the exact-string path."""

from pyspark.sql import Row

from ton_etl_spark.operators.decontam import decontaminate


def _docs(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


CORPUS = [
    # train docs
    {"doc_id": 1, "split": "train",
     "text": "alpha beta gamma delta epsilon zeta eta theta"},
    {"doc_id": 2, "split": "train",
     "text": "one two three four five six seven eight nine ten"},
    # exact copy of doc 1 leaked into test
    {"doc_id": 10, "split": "test",
     "text": "alpha beta gamma delta epsilon zeta eta theta"},
    # half-overlapping: first 8 tokens of doc 2 then fresh tail
    {"doc_id": 11, "split": "val",
     "text": "one two three four five six seven eight blue red green"},
    # clean eval doc
    {"doc_id": 12, "split": "test",
     "text": "lorem ipsum dolor sit amet consectetur adipiscing elit"},
    # too short for a single 5-gram
    {"doc_id": 13, "split": "val", "text": "tiny doc"},
]


def test_planted_leak_flagged(spark):
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            _docs(spark, CORPUS), ngram=5, threshold=0.3
        ).collect()
    }
    # train docs never appear in the report
    assert set(out) == {10, 11, 12, 13}
    full = out[10]
    assert full["n_shingles"] == 4  # 8 tokens -> 4 distinct 5-grams
    assert full["n_hit"] == 4
    assert full["contam_frac"] == 1.0 and full["is_contaminated"] == 1
    clean = out[12]
    assert clean["n_hit"] == 0 and clean["is_contaminated"] == 0


def test_partial_overlap_counts(spark):
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            _docs(spark, CORPUS), ngram=5, threshold=0.3
        ).collect()
    }
    partial = out[11]
    # 11 tokens -> 7 shingles; the 4 shingles inside tokens 1..8 are
    # also train-doc-2 shingles, the 3 crossing into the fresh tail
    # are not
    assert partial["n_shingles"] == 7
    assert partial["n_hit"] == 4
    assert partial["is_contaminated"] == 1  # 4/7 > 0.3
    # threshold above the fraction clears the flag
    strict = {
        r["doc_id"]: r
        for r in decontaminate(
            _docs(spark, CORPUS), ngram=5, threshold=0.75
        ).collect()
    }
    assert strict[11]["is_contaminated"] == 0
    assert strict[10]["is_contaminated"] == 1


def test_short_doc_wellformed(spark):
    out = {
        r["doc_id"]: r
        for r in decontaminate(_docs(spark, CORPUS), ngram=5).collect()
    }
    tiny = out[13]
    assert tiny["n_shingles"] == 0 and tiny["n_hit"] == 0
    assert tiny["contam_frac"] == 0.0 and tiny["is_contaminated"] == 0


def test_hash_shingles_path_agrees(spark):
    df = _docs(spark, CORPUS)
    exact = sorted(
        tuple(r) for r in decontaminate(df, ngram=5).collect()
    )
    hashed = sorted(
        tuple(r)
        for r in decontaminate(df, ngram=5, hash_shingles=True).collect()
    )
    assert exact == hashed

def test_bloom_prefilter_path_agrees(spark):
    df = _docs(spark, CORPUS)
    exact = sorted(tuple(r) for r in decontaminate(df, ngram=5).collect())
    bloomed = sorted(
        tuple(r)
        for r in decontaminate(df, ngram=5, bloom_prefilter=True).collect()
    )
    assert exact == bloomed


def test_bloom_unit():
    # pure bit-set semantics, no Spark needed for the bound check
    import warnings

    from ton_etl_spark.operators.bloom import build_bloom

    class _FakeKeys:  # over-the-bound path never runs a job after count
        def count(self):
            return 1 << 40

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert build_bloom(_FakeKeys(), "k") is None
        assert any("skipping the prefilter" in str(x.message) for x in w)


def test_bloom_membership(spark):
    from pyspark.sql import functions as F

    from ton_etl_spark.operators.bloom import build_bloom

    keys = spark.range(1000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bf = build_bloom(keys, "k")
    # zero false negatives: every inserted key probes true
    n_in = keys.filter(bf.contains(F.col("k"))).count()
    assert n_in == 1000
    # false-positive rate on disjoint probes stays near the estimate
    probes = spark.range(20000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("k")
    )
    fp = probes.filter(bf.contains(F.col("k"))).count()
    assert fp / 20000 <= max(0.03, 3 * bf.fpp_estimate)
