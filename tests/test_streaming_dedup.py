"""Watermark-bounded dedup: one function, two execution modes.

At-least-once redelivery (byte-identical events, duplicated within the
same trigger AND across later triggers inside the watermark) must be
suppressed to exactly the batch twin's output; the streaming result
must contain no duplicate keys at all.
"""

import datetime as dt
import os
import time

from ton_etl_spark.streaming.dedup import dedup_events

BASE = dt.datetime(2024, 1, 1)
SCHEMA = "repo string, path string, lsn long, ts timestamp, payload string"


def _ts(s):
    return BASE + dt.timedelta(seconds=s)


def _ev(repo, path, lsn, sec):
    return (repo, path, lsn, _ts(sec), f"{repo}/{path}@{lsn}")


def _write_stream_files(spark, tmp_path, files, name):
    src = str(tmp_path / f"src_{name}")
    stage = str(tmp_path / f"stage_{name}")
    os.makedirs(src)
    for i, chunk in enumerate(files):
        p = os.path.join(src, f"f{i}.parquet")
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), p)
        os.utime(p, (time.time() + i, time.time() + i))
    return src


def test_streaming_dedup_matches_batch_twin(spark, tmp_path):
    keys = ["repo", "path", "lsn"]
    files = [
        # trigger 1: two events, one duplicated inside the trigger
        [_ev("r1", "a", 1, 0), _ev("r1", "a", 1, 0), _ev("r2", "b", 2, 60)],
        # trigger 2: redelivery of both (within watermark) + one new
        [_ev("r1", "a", 1, 0), _ev("r2", "b", 2, 60), _ev("r1", "a", 3, 120)],
        # trigger 3: yet another redelivery + new event
        [_ev("r1", "a", 3, 120), _ev("r3", "c", 4, 180)],
    ]
    src = _write_stream_files(spark, tmp_path, files, "dedup")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        dedup_events(stream, keys, ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        tuple(r[k] for k in keys): r["payload"]
        for r in spark.sql("select * from dedup_out").collect()
    }
    # no duplicate keys at all
    assert len(got) == spark.sql("select * from dedup_out").count()

    all_rows = [e for chunk in files for e in chunk]
    batch = dedup_events(spark.createDataFrame(all_rows, SCHEMA), keys)
    want = {
        tuple(r[k] for k in keys): r["payload"] for r in batch.collect()
    }
    assert got == want
    assert got == {
        ("r1", "a", 1): "r1/a@1",
        ("r2", "b", 2): "r2/b@2",
        ("r1", "a", 3): "r1/a@3",
        ("r3", "c", 4): "r3/c@4",
    }
