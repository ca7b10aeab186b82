"""Quantized n-gram LM scoring + NB classification (operators/lm.py):
hand-computed bit costs, OOV handling, short-doc edge, classifier
behavior, and parallelism-independence of the integer scores."""

from pyspark.sql import Row, functions as F

from ton_etl_spark.operators.lm import (
    lm_bitcost,
    nb_classify,
    train_ngram_lm,
    train_nb,
)

# reference corpus: bigrams of doc 0 = {a b, b a, a b} -> cnt(a b)=2,
# cnt(b a)=1, V=3, bitlen(V)=2; cost(a b)=2-2=0, cost(b a)=2-1=1, OOV=3
REF = [Row(doc_id=0, text="a b a b")]
SCORE = [
    Row(doc_id=0, text="a b a b"),   # grams: ab,ba,ab  -> 0+1+0 = 1
    Row(doc_id=1, text="a b c"),     # ab, bc(OOV)      -> 0+3   = 3
    Row(doc_id=2, text="z"),         # no bigram        -> 0
]


def test_bitcost_hand_values(spark):
    model = train_ngram_lm(spark.createDataFrame(REF), "doc_id", "text", n=2)
    out = {
        r["doc_id"]: r
        for r in lm_bitcost(
            spark.createDataFrame(SCORE), "doc_id", "text", model, n=2
        ).collect()
    }
    assert (out[0]["n_grams"], out[0]["total_bits"]) == (3, 1)
    assert out[0]["avg_bits"] == round(1 / 3, 6)
    assert (out[1]["n_grams"], out[1]["total_bits"]) == (2, 3)
    assert out[1]["avg_bits"] == 1.5
    # sub-bigram doc stays present with zero cost, no div-by-zero
    assert (out[2]["n_grams"], out[2]["total_bits"], out[2]["avg_bits"]) == (
        0, 0, 0.0,
    )


def test_bitcost_partitioning_independent(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i % 7} w{i % 5} w{i % 3} w{i % 2}")
         for i in range(200)]
    )
    model = train_ngram_lm(
        docs.filter(F.col("doc_id") % 3 == 0), "doc_id", "text", n=2
    )
    a = sorted(
        lm_bitcost(docs, "doc_id", "text", model, n=2).collect()
    )
    b = sorted(
        lm_bitcost(
            docs.repartition(13), "doc_id", "text", model.repartition(7), n=2
        ).collect()
    )
    assert a == b  # integer bit costs: exact at any layout


def test_nb_classifies_by_vocabulary(spark):
    train = spark.createDataFrame(
        [Row(doc_id=0, lang="en", text="the cat sat"),
         Row(doc_id=1, lang="en", text="the dog ran"),
         Row(doc_id=2, lang="fr", text="le chat assis"),
         Row(doc_id=3, lang="fr", text="le chien court")]
    )
    test = spark.createDataFrame(
        [Row(doc_id=10, text="the cat ran"),
         Row(doc_id=11, text="le chat court")]
    )
    model = train_nb(train, "doc_id", "text", "lang", n=1)
    pred = {
        r["doc_id"]: r["predicted"]
        for r in nb_classify(test, "doc_id", "text", model, "lang").collect()
    }
    assert pred == {10: "en", 11: "fr"}


def test_nb_tie_breaks_to_smallest_class(spark):
    train = spark.createDataFrame(
        [Row(doc_id=0, lang="b", text="x y"),
         Row(doc_id=1, lang="a", text="x y")]
    )
    test = spark.createDataFrame([Row(doc_id=9, text="x y q")])
    model = train_nb(train, "doc_id", "text", "lang", n=1)
    out = nb_classify(test, "doc_id", "text", model, "lang").collect()
    assert out[0]["predicted"] == "a"  # identical cost under both models
