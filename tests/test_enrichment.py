"""E8 enrichment fallback chain: first-success wins, transient failures
retry then fall through, total failure degrades NonCritically."""

from ton_etl_spark.operators.enrichment import enrich, flaky_stub, offline_resolver


def test_fallback_chain_and_noncritical(spark):
    df = spark.createDataFrame(
        [
            (1, "ipfs://Qm123/meta.json"),
            (2, "ipfs://broken/gateway"),   # primary raises -> fallback
            (3, "not-a-uri"),               # nothing resolves -> null row
            (4, None),
        ],
        "id long, uri string",
    )
    out = {
        r["id"]: r.asDict()
        for r in enrich(
            df,
            "uri",
            resolvers=[
                ("flaky", flaky_stub(("ipfs://broken",))),
                ("offline", offline_resolver),
            ],
            batch_rows=2,
        ).collect()
    }
    assert out[1]["enrich_source"] == "offline"  # flaky declined, offline won
    assert '"meta.json"' in out[1]["enriched"]
    assert out[2]["enrich_source"] == "offline"  # flaky raised, chain advanced
    assert out[3]["enriched"] is None and out[3]["enrich_source"] is None
    assert out[4]["enriched"] is None
    assert len(out) == 4  # no row lost (NonCritical)
