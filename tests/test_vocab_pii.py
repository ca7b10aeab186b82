"""Vocabulary stats (operators/vocab.py) and PII scan/redact
(operators/pii.py): known-value kernels, determinism, plan hygiene."""

import pytest
from pyspark.sql import Row

from ton_etl_spark.operators.pii import pii_report, redact_pii, scan_pii
from ton_etl_spark.operators.vocab import (
    length_histogram,
    source_salient_terms,
    vocab_topk,
)

DOCS = [
    Row(doc_id=0, src="a", text="red red red blue  green"),
    Row(doc_id=1, src="a", text="red blue blue"),
    Row(doc_id=2, src="b", text="green green green green zeta"),
    Row(doc_id=3, src="b", text=" "),  # blank: must contribute no tokens
]


def _df(spark):
    return spark.createDataFrame(DOCS)


def test_vocab_topk_counts_and_ties(spark):
    out = vocab_topk(_df(spark), "text", k=3).collect()
    # counts: green 5, red 4, blue 3, zeta 1; tie-free here
    assert [(r["tok"], r["n"]) for r in out] == [
        ("green", 5), ("red", 4), ("blue", 3)
    ]


def test_vocab_topk_blank_doc_contributes_nothing(spark):
    out = vocab_topk(_df(spark), "text", k=10).collect()
    assert all(r["tok"].strip() for r in out)
    assert sum(r["n"] for r in out) == 13  # 5+4+3+1, nothing from doc 3


def test_salient_terms_rank_and_df(spark):
    rows = source_salient_terms(_df(spark), "src", "text", k=2).collect()
    by = {(r["grp"], r["rank"]): r for r in rows}
    assert by[("a", 1)]["tok"] == "red" and by[("a", 1)]["tf"] == 4
    assert by[("a", 2)]["tok"] == "blue" and by[("a", 2)]["tf"] == 3
    assert by[("b", 1)]["tok"] == "green" and by[("b", 1)]["tf"] == 4
    # df: red/blue appear in 1 source, green in 2
    assert by[("a", 1)]["df"] == 1
    assert by[("b", 1)]["df"] == 2


def test_salient_terms_max_df_filters_common_tokens(spark):
    rows = source_salient_terms(
        _df(spark), "src", "text", k=5, max_df=1
    ).collect()
    toks = {r["tok"] for r in rows}
    assert "green" not in toks  # df=2 > max_df
    assert {"red", "blue", "zeta"} <= toks


def test_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [Row(lang="en", n=0), Row(lang="en", n=499), Row(lang="en", n=500),
         Row(lang="de", n=1200)]
    )
    rows = length_histogram(df, "n", 500, ["lang"]).collect()
    m = {(r["lang"], r["bucket"]): (r["n_docs"], r["sum_len"]) for r in rows}
    assert m[("en", 0)] == (2, 499)
    assert m[("en", 1)] == (1, 500)
    assert m[("de", 2)] == (1, 1200)


def test_length_histogram_rejects_bad_width(spark):
    with pytest.raises(ValueError):
        length_histogram(_df(spark), "doc_id", 0)


PII_DOCS = [
    Row(doc_id=0, text="mail a.b-c_1@ex-ample.co.uk now"),
    Row(doc_id=1, text="call 555-123-4567 or 555-000-1111"),
    Row(doc_id=2, text="host 192.168.0.1 up"),
    Row(doc_id=3, text="clean text only"),
    # 12-digit run: the phone pattern must NOT fire without boundaries
    Row(doc_id=4, text="id 5551234567890 raw"),
]


def test_scan_pii_counts(spark):
    df = scan_pii(spark.createDataFrame(PII_DOCS), "text")
    m = {r["doc_id"]: r for r in df.collect()}
    assert (m[0]["n_email"], m[0]["n_phone"], m[0]["n_ipv4"]) == (1, 0, 0)
    assert m[1]["n_phone"] == 2
    assert m[2]["n_ipv4"] == 1
    assert (m[3]["n_email"] + m[3]["n_phone"] + m[3]["n_ipv4"]) == 0
    assert m[4]["n_phone"] == 0


def test_redact_pii_replaces_all_kinds(spark):
    df = redact_pii(spark.createDataFrame(PII_DOCS), "text")
    m = {r["doc_id"]: r["text_redacted"] for r in df.collect()}
    assert m[0] == "mail <EMAIL> now"
    assert m[1] == "call <PHONE> or <PHONE>"
    assert m[2] == "host <IPV4> up"
    assert m[3] == "clean text only"


def test_pii_report_totals_and_sha(spark):
    rows = pii_report(spark.createDataFrame(PII_DOCS), "doc_id", "text").collect()
    m = {r["doc_id"]: r for r in rows}
    assert m[1]["n_pii"] == 2
    import hashlib

    assert m[2]["redacted_sha"] == hashlib.sha256(b"host <IPV4> up").hexdigest()


def test_pii_report_no_shuffle(spark):
    plan = pii_report(
        spark.createDataFrame(PII_DOCS), "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
