"""Everything-on end-to-end: maturity gate + silver fan-out + gold +
learned blacklist + bot repos + disordered renames + kill/resume, all
in one streaming run — the closest in-sandbox analogue of the
production topology (reference: all parsers + exporter + datamart
running against one Debezium stream)."""

import pytest

from ton_etl_spark.cdc.blacklist import LearnedBlacklist
from ton_etl_spark.cdc.pipeline import CdcPipeline
from ton_etl_spark.cdc.silver import SilverFanout
from ton_etl_spark.datagen import (
    ARRIVAL_JITTER,
    GenParams,
    generate_events,
    write_event_log,
)
from ton_etl_spark.gold import GoldDecayedPrice
from ton_etl_spark.lake.table import LakeTable
from ton_etl_spark.schemas import REPOS_KEY_FIELDS, REPOS_SCHEMA

from test_cdc_e2e import oracle_state, table_state
from test_silver_gold import fact_oracle


def test_everything_on_with_kill_resume(spark, tmp_path):
    p = GenParams(
        n_events=5000,
        n_repos=20,
        paths_per_repo=10,
        n_files=10,
        p_facts=0.25,
        p_bot_repos=0.15,
        p_rename=0.05,
        rename_barrier=False,
    )
    events = generate_events(p)
    log_dir = str(tmp_path / "events")
    write_event_log(events, log_dir, p.n_files)

    def build():
        try:
            table = LakeTable.create(
                spark, str(tmp_path / "lake"), REPOS_SCHEMA, REPOS_KEY_FIELDS,
                "lsn", bucket_count=16,
            )
        except FileExistsError:
            table = LakeTable(spark, str(tmp_path / "lake"))
        fanout = SilverFanout(spark, str(tmp_path / "silver"))
        gold = GoldDecayedPrice(
            spark, str(tmp_path / "gold"), fanout.tables["trades"], window_s=600
        )
        return table, CdcPipeline(
            spark, table, log_dir, str(tmp_path / "cp"),
            max_files_per_trigger=2,
            maturity=int(ARRIVAL_JITTER) + 50,
            fanout=fanout,
            gold=gold,
            blacklist=LearnedBlacklist(min_batches=2),
        ), fanout, gold

    table, pipe, _, _ = build()
    pipe.fail_after = 2
    with pytest.raises(Exception):
        pipe.run_streaming()

    table, pipe2, fanout, gold = build()
    pipe2.run_streaming()

    # main table: oracle-exact despite gate + blacklist + disordered renames
    expected, _ = oracle_state(events)
    assert table_state(table) == expected

    # silver: trades/comments exact, metadata LWW exact
    trades, meta, comments = fact_oracle(events)
    got_trades = {
        r["trade_id"]: (r["asset"], r["side"], int(r["amount"]))
        for r in fanout.tables["trades"].read().collect()
    }
    assert got_trades == {k: (a, s, am) for k, (a, s, am, _) in trades.items()}
    got_meta = {r["repo"]: r["lsn"] for r in fanout.tables["metadata"].read().collect()}
    assert got_meta == {k: v[0] for k, v in meta.items()}
    assert fanout.tables["comments"].read().count() == len(comments)

    # gold: incremental == batch recompute
    inc = {
        (r["asset"], r["window_start"]): round(r["decayed_avg"], 6)
        for r in gold.table.read().collect()
    }
    full = {
        (r["asset"], r["window_start"]): round(r["decayed_avg"], 6)
        for r in gold.full_recompute().collect()
    }
    assert inc == full
