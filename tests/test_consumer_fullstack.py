"""Full-stack change-feed consumption: a ChangeFeedConsumer tails the
table the streaming CDC pipeline maintains (out-of-order, duplicated,
deleted, renamed, DDL-evolving events) into a downstream datamart,
polling BETWEEN pipeline runs and across a mid-stream crash. The
mirror must converge to the main table's exact live state — including
columns added by mid-stream DDL, which the mirror handler syncs from
the source schema (idempotent add_column)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from ton_etl_spark.cdc.pipeline import CdcPipeline
from ton_etl_spark.datagen import GenParams, generate_events, write_event_log
from ton_etl_spark.lake import ChangeFeedConsumer, LakeTable, merge_into
from ton_etl_spark.schemas import REPOS_KEY_FIELDS, REPOS_SCHEMA

from test_cdc_e2e import table_state


def _mirror(main, down):
    def fn(feed):
        # schema sync: replay source DDL onto the mirror (idempotent) —
        # adds AND widenings (a widened source column delivered into a
        # narrower mirror column would overflow-truncate silently)
        have = {
            f.name: f.dataType.simpleString()
            for f in down.schema(include_system=True).fields
        }
        for f in main.schema(include_system=True).fields:
            want = f.dataType.simpleString()
            if f.name not in have:
                down.add_column(f.name, want)
            elif have[f.name] != want:
                down.widen_column(f.name, want)
        merge_into(
            down,
            feed.withColumn(
                "op", F.when(F.col("_deleted"), "d").otherwise("u")
            ).drop("_deleted"),
        )
    return fn


def test_consumer_tails_pipeline_across_crash(spark, tmp_path):
    p = GenParams(n_events=3000, n_repos=15, paths_per_repo=12, n_files=10)
    events = generate_events(p)
    log_dir = str(tmp_path / "events")
    write_event_log(events, log_dir, p.n_files)

    main = LakeTable.create(
        spark, str(tmp_path / "main"), REPOS_SCHEMA, REPOS_KEY_FIELDS,
        "lsn", bucket_count=16,
    )
    down = LakeTable.create(
        spark, str(tmp_path / "down"), REPOS_SCHEMA, REPOS_KEY_FIELDS,
        "lsn", bucket_count=16,
    )
    cp = str(tmp_path / "cp")
    consumer = ChangeFeedConsumer(main, str(tmp_path / "cursor"))
    fn = _mirror(main, down)

    # phase 1: pipeline crashes mid-stream; consumer polls the partial state
    pipe = CdcPipeline(spark, main, log_dir, cp, max_files_per_trigger=2)
    pipe.fail_after = 2
    with pytest.raises(StreamingQueryException):
        pipe.run_streaming()
    r = consumer.poll(fn)
    assert r["delivered"]
    assert table_state(down) == table_state(main)  # mirror of the partial state

    # phase 2: pipeline resumes (crashed batch replays, is absorbed),
    # streams to completion; consumer catches up in one poll
    CdcPipeline(spark, main, log_dir, cp, max_files_per_trigger=2).run_streaming()
    r = consumer.poll(fn)
    assert r["delivered"] and r["cursor"] == main.current_version()
    assert table_state(down) == table_state(main)

    # idle steady state
    assert not consumer.poll(fn)["delivered"]

    # a second, independent consumer bootstrapping from scratch converges
    # to the same mirror (cursor -1 = full history)
    down2 = LakeTable.create(
        spark, str(tmp_path / "down2"), REPOS_SCHEMA, REPOS_KEY_FIELDS,
        "lsn", bucket_count=8,
    )
    c2 = ChangeFeedConsumer(main, str(tmp_path / "cursor2"))
    c2.poll(_mirror(main, down2))
    assert table_state(down2) == table_state(main)
