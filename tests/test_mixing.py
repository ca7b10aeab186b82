"""Corpus mixing (operators/mixing.py): quota math, binding-group
behavior, determinism under repartitioning, and validation."""

import pytest
from pyspark.sql import Row, functions as F

from ton_etl_spark.operators.mixing import mix_corpus, mix_manifest

# skewed corpus: 60 web, 30 code, 6 wiki docs
ROWS = (
    [Row(doc_id=i, grp="web") for i in range(100, 160)]
    + [Row(doc_id=i, grp="code") for i in range(300, 330)]
    + [Row(doc_id=i, grp="wiki") for i in range(500, 506)]
    + [Row(doc_id=i, grp="junk") for i in range(900, 910)]  # unweighted
)
W = {"web": 60, "code": 30, "wiki": 10}


def _df(spark):
    return spark.createDataFrame(ROWS)


def test_quota_math_and_binding_group(spark):
    m = {r["grp"]: r for r in mix_manifest(_df(spark), "grp", "doc_id", W).collect()}
    # wiki is binding: T = min(60*100//60, 30*100//30, 6*100//10) = 60
    # quotas: web 36, code 18, wiki 6
    assert (m["web"]["n_total"], m["web"]["quota"]) == (60, 36)
    assert (m["code"]["n_total"], m["code"]["quota"]) == (30, 18)
    assert (m["wiki"]["n_total"], m["wiki"]["quota"]) == (6, 6)
    for r in m.values():
        assert r["n_kept"] == r["quota"]
    # proportions are exactly 60/30/10 of T=60
    assert m["web"]["n_kept"] + m["code"]["n_kept"] + m["wiki"]["n_kept"] == 60
    # unweighted group dropped entirely
    assert "junk" not in m


def test_mixed_corpus_rows(spark):
    kept = mix_corpus(_df(spark), "grp", "doc_id", W)
    assert kept.columns == ["grp", "doc_id"]
    by = {r["grp"]: 0 for r in kept.collect()}
    for r in kept.collect():
        by[r["grp"]] += 1
    assert by == {"web": 36, "code": 18, "wiki": 6}


def test_repartition_invariant_selection(spark):
    df = _df(spark)
    a = sorted(r["doc_id"] for r in mix_corpus(df, "grp", "doc_id", W).collect())
    b = sorted(
        r["doc_id"]
        for r in mix_corpus(df.repartition(13), "grp", "doc_id", W).collect()
    )
    assert a == b
    # a different salt draws a different (same-size) corpus
    c = sorted(
        r["doc_id"]
        for r in mix_corpus(df, "grp", "doc_id", W, salt="mix-v2").collect()
    )
    assert len(c) == len(a) and c != a


def test_weight_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        mix_corpus(df, "grp", "doc_id", {"web": 0, "code": 1})
    with pytest.raises(ValueError):
        mix_corpus(df, "grp", "doc_id", {"web": 0.5, "code": 0.5})


def test_empty_weighted_group_zero_quota(spark):
    # a weighted group with no rows at all -> T = 0 -> every quota 0
    m = mix_manifest(
        _df(spark), "grp", "doc_id", {"web": 50, "absent": 50}
    ).collect()
    # 'absent' never appears in counts (no rows), so only web is listed;
    # its quota is driven by its own count alone
    got = {r["grp"]: r for r in m}
    assert "absent" not in got
    assert got["web"]["quota"] == got["web"]["n_kept"]