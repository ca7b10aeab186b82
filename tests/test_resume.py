"""Resume-after-kill at checkpoint boundaries (north rule T1/T7).

The injected crash fires AFTER the sink (lake table) committed a batch
but BEFORE Structured Streaming checkpointed it — the razor's edge of
the exactly-once protocol. On restart the batch is replayed and must be
absorbed: the manifest batch_id guard skips the merge, the DDLs are
idempotent, and the final state still matches the sequential oracle.
"""

import dataclasses
import hashlib

import pytest
from pyspark.sql.streaming import StreamingQueryException

from ton_etl_spark.cdc.pipeline import CdcPipeline
from ton_etl_spark.datagen import GenParams, generate_events, write_event_log
from ton_etl_spark.lake.table import LakeTable
from ton_etl_spark.oracle import reduce_events
from ton_etl_spark.schemas import REPOS_KEY_FIELDS, REPOS_SCHEMA

from test_cdc_e2e import oracle_state, table_state


@pytest.mark.parametrize("kill_after", [1, 2, 3])
def test_kill_and_resume(spark, tmp_path, kill_after):
    p = GenParams(n_events=3000, n_repos=15, paths_per_repo=12, n_files=10)
    events = generate_events(p)
    log_dir = str(tmp_path / "events")
    write_event_log(events, log_dir, p.n_files)

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), REPOS_SCHEMA, REPOS_KEY_FIELDS,
        "lsn", bucket_count=16,
    )
    cp = str(tmp_path / "cp")

    pipe = CdcPipeline(spark, table, log_dir, cp, max_files_per_trigger=2)
    pipe.fail_after = kill_after
    with pytest.raises(StreamingQueryException):
        pipe.run_streaming()
    assert pipe.batches_applied == kill_after
    v_at_crash = table.current_version()

    # restart from the same checkpoint: the crashed batch replays and is
    # skipped by the sink's batch_id guard, then the rest streams through
    pipe2 = CdcPipeline(spark, table, log_dir, cp, max_files_per_trigger=2)
    pipe2.run_streaming()
    assert table.current_version() >= v_at_crash

    expected, _ = oracle_state(events)
    got = table_state(table)
    assert got == expected, (
        f"state mismatch after kill@{kill_after}+resume: "
        f"{len(set(got) ^ set(expected))} key diffs"
    )

    # the replayed batch must not have produced a second merge commit:
    # merge-commit batch_ids are strictly increasing (DDL commits inherit
    # the previous batch_id and don't count)
    bids = [
        h["batch_id"]
        for h in table.history()
        if h["lineage"].get("type") == "merge"
    ]
    assert bids == sorted(set(bids))
