"""Silver fan-out (trade/metadata/comment parsers -> separate tables)
and continuous gold maintenance (agg_prices analogue), including
exactly-once across kill/resume and cross-table crash healing."""

import base64
import json
import zlib

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.cdc.pipeline import CdcPipeline, apply_batch
from ton_etl_spark.cdc.silver import SilverFanout
from ton_etl_spark.datagen import GenParams, generate_events, write_event_log
from ton_etl_spark.gold import GoldAssetTvl, GoldDecayedPrice
from ton_etl_spark.lake.table import LakeTable
from ton_etl_spark.schemas import CHANGE_EVENT_SCHEMA, REPOS_KEY_FIELDS, REPOS_SCHEMA


PARAMS = GenParams(
    n_events=3000, n_repos=12, paths_per_repo=10, n_files=8, p_facts=0.35
)


def fact_oracle(events):
    """Sequential Python decode of fact events (dedup by lsn)."""
    seen = {}
    for e in events:
        seen.setdefault(e.lsn, e)
    trades, meta, comments = {}, {}, {}
    for lsn in sorted(seen):
        e = seen[lsn]
        if e.event_type == "trade_event":
            o = json.loads(e.payload)
            amount = int.from_bytes(
                base64.b64decode(o["amount_value"]), "big", signed=True
            ) // (10 ** o["amount_scale"])
            price = (
                int.from_bytes(
                    base64.b64decode(o["price_value"]), "big", signed=True
                )
                / 10 ** o["price_scale"]
            )
            trades[lsn] = (o["asset"], o["side"], amount, price)
        elif e.event_type == "metadata_event":
            o = json.loads(e.payload)
            meta[e.repo] = (lsn, o["name"], o["symbol"], o["sources_csv"])
        elif e.event_type == "comment_event":
            o = json.loads(e.payload)
            text = zlib.decompress(base64.b64decode(o["text_z"])).decode()
            comments[lsn] = (e.repo, text, len(text.split()))
    return trades, meta, comments


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sg")
    events = generate_events(PARAMS)
    log_dir = str(tmp / "events")
    write_event_log(events, log_dir, PARAMS.n_files)

    def build():
        try:
            table = LakeTable.create(
                spark, str(tmp / "lake"), REPOS_SCHEMA, REPOS_KEY_FIELDS,
                "lsn", bucket_count=16,
            )
        except FileExistsError:
            table = LakeTable(spark, str(tmp / "lake"))
        fanout = SilverFanout(spark, str(tmp / "silver"))
        golds = [
            GoldDecayedPrice(
                spark, str(tmp / "gold"), fanout.tables["trades"], window_s=600
            ),
            GoldAssetTvl(spark, str(tmp / "gold_tvl"), fanout.tables["trades"]),
        ]
        return table, fanout, golds

    table, fanout, golds = build()
    pipe = CdcPipeline(
        spark, table, log_dir, str(tmp / "cp"), max_files_per_trigger=2,
        fanout=fanout, gold=golds,
    )
    pipe.fail_after = 2  # crash after 2 micro-batches (post-commit)
    with pytest.raises(Exception):
        pipe.run_streaming()

    # resume from checkpoint with freshly constructed objects
    table, fanout, golds = build()
    pipe2 = CdcPipeline(
        spark, table, log_dir, str(tmp / "cp"), max_files_per_trigger=2,
        fanout=fanout, gold=golds,
    )
    pipe2.run_streaming()
    return events, table, fanout, golds


def test_trades_match_oracle_incl_bigint_amounts(spark, pipeline_run):
    events, _, fanout, _ = pipeline_run
    trades, _, _ = fact_oracle(events)
    rows = {
        r["trade_id"]: (r["asset"], r["side"], int(r["amount"]), r["price"])
        for r in fanout.tables["trades"].read().collect()
    }
    expect = {
        lsn: (a, s, am, pytest.approx(pr)) for lsn, (a, s, am, pr) in trades.items()
    }
    assert set(rows) == set(expect)
    assert rows == expect
    # the decimal(38,0) range was actually exercised
    assert any(abs(v[2]) > 2**63 for v in rows.values())


def test_metadata_lww_and_csv_struct(spark, pipeline_run):
    events, _, fanout, _ = pipeline_run
    _, meta, _ = fact_oracle(events)
    rows = {
        r["repo"]: (r["lsn"], r["name"], r["symbol"], r["sources"])
        for r in fanout.tables["metadata"].read().collect()
    }
    assert set(rows) == set(meta)
    for repo, (lsn, name, symbol, csv) in meta.items():
        got = rows[repo]
        assert got[0] == lsn and got[1] == name and got[2] == symbol
        assert list(got[3]) == csv.split(",")  # P6: CSV -> 6-field struct


def test_comments_decoded(spark, pipeline_run):
    events, _, fanout, _ = pipeline_run
    _, _, comments = fact_oracle(events)
    rows = {
        r["comment_id"]: (r["repo"], r["text"], r["n_tokens"])
        for r in fanout.tables["comments"].read().collect()
    }
    assert rows == comments


def test_gold_matches_full_recompute_after_resume(spark, pipeline_run):
    _, _, _, (gold, _) = pipeline_run

    def snap(df):
        return {
            (r["asset"], r["window_start"]): (
                round(r["decayed_avg"], 6), r["n_obs"]
            )
            for r in df.collect()
        }

    incremental = snap(
        gold.table.read().select("asset", "window_start", "decayed_avg", "n_obs")
    )
    recomputed = snap(gold.full_recompute())
    assert incremental == recomputed
    assert len(incremental) > 5


def test_crash_between_main_and_silver_commits_heals(spark, tmp_path):
    """Simulates the razor's edge: the main table committed batch N but
    the process died before the silver commit. The replay must apply
    silver (and skip main) — per-table batch_id guards, not a global
    short-circuit."""
    p = GenParams(n_events=400, n_repos=6, n_files=2, p_facts=0.4)
    events = generate_events(p)
    log_dir = str(tmp_path / "events")
    write_event_log(events, log_dir, p.n_files)
    ev = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(log_dir)

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), REPOS_SCHEMA, REPOS_KEY_FIELDS, "lsn",
        bucket_count=8,
    )
    # "crash before silver": apply batch 3 without fan-out attached
    apply_batch(spark, table, ev, batch_id=3)
    v_main = table.current_version()

    # replay batch 3 with fan-out attached
    fanout = SilverFanout(spark, str(tmp_path / "silver"))
    res = apply_batch(spark, table, ev, batch_id=3, fanout=fanout)
    assert table.current_version() == v_main  # main skipped (guard)
    assert fanout.tables["trades"].read().count() > 0  # silver healed

    # full replay of the same batch is a no-op everywhere
    v_silver = fanout.tables["trades"].current_version()
    res2 = apply_batch(spark, table, ev, batch_id=3, fanout=fanout)
    assert table.current_version() == v_main
    assert fanout.tables["trades"].current_version() == v_silver
    assert res2["silver"]["trades"].get("skipped")


def test_asset_tvl_matches_full_recompute_after_resume(spark, pipeline_run):
    """The second continuously-maintained gold table (dex_pool TVL
    analogue): the incrementally maintained per-asset TVL must equal a
    full batch recompute from silver even across the kill/resume in the
    fixture. Relative tolerance: partial-aggregation order of the
    double sum is nondeterministic."""
    events, _, fanout, (_, tvl) = pipeline_run
    incremental = {
        r["asset"]: (r["tvl"], r["n_trades"])
        for r in tvl.table.read().collect()
    }
    recomputed = {
        r["asset"]: (r["tvl"], r["n_trades"])
        for r in tvl.full_recompute().collect()
    }
    assert set(incremental) == set(recomputed)
    for a, (v, n) in recomputed.items():
        got = incremental[a]
        assert got[0] == pytest.approx(v, rel=1e-9) and got[1] == n
    assert len(incremental) > 3

    # ...and against the sequential Python oracle
    trades, _, _ = fact_oracle(events)
    expect: dict[str, float] = {}
    for _, (asset, _, amount, price) in trades.items():
        expect[asset] = expect.get(asset, 0.0) + float(amount) * price
    assert set(expect) == set(incremental)
    for a, v in expect.items():
        assert incremental[a][0] == pytest.approx(v, rel=1e-6)


def test_top_tokens_by_tvl(spark, pipeline_run):
    """Reference README.md:253-257: dex_pool_link JOIN dex_pool
    GROUP BY token ORDER BY tvl DESC LIMIT k, over the maintained
    tables."""
    events, _, fanout, (_, tvl) = pipeline_run
    top = tvl.top_tokens(fanout.tables["metadata"], k=5).collect()
    assert 0 < len(top) <= 5
    vals = [r["total_tvl"] for r in top]
    assert vals == sorted(vals, reverse=True)

    trades, meta, _ = fact_oracle(events)
    by_asset: dict[str, float] = {}
    for _, (asset, _, amount, price) in trades.items():
        by_asset[asset] = by_asset.get(asset, 0.0) + float(amount) * price
    by_sym: dict[str, float] = {}
    for repo, (_, _, symbol, _) in meta.items():
        if repo in by_asset and by_asset[repo] > 0:
            by_sym[symbol] = by_sym.get(symbol, 0.0) + by_asset[repo]
    expect = sorted(by_sym.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["symbol"] for r in top] == [s for s, _ in expect]
    for r, (_, v) in zip(top, expect):
        assert r["total_tvl"] == pytest.approx(v, rel=1e-6)
