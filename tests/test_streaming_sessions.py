"""Session windows: batch gaps-and-islands operator vs the
applyInPandasWithState streaming operator.

The streaming operator must emit exactly the batch operator's sessions
(same ordinals, bounds, counts, sums) when driven through a real
time-sliced file stream: earlier sessions close on the gap rule as
later events arrive, each key's final session closes via the
event-time timeout once the watermark passes its deadline."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.operators.sessions import session_windows
from ton_etl_spark.streaming.sessions import sessionize_stream

BASE = dt.datetime(2024, 1, 1)
GAP = 1000
SENTINEL = 9999


def _ts(s):
    return BASE + dt.timedelta(seconds=s)


def test_batch_session_windows_hand_values(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 2.0), (1, _ts(100), 3.0), (1, _ts(5000), 1.0),
         (1, _ts(5100), 4.0), (2, _ts(50), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        (r["user_id"], r["session_id"]): r.asDict()
        for r in session_windows(df, "user_id", "ts", GAP, "value").collect()
    }
    base_s = out[(1, 1)]["session_start_s"]
    assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["total_value"] == 5.0
    assert out[(1, 1)]["session_end_s"] - base_s == 100
    assert out[(1, 2)]["n_events"] == 2 and out[(1, 2)]["total_value"] == 5.0
    assert out[(2, 1)]["n_events"] == 1 and out[(2, 1)]["total_value"] == 7.0


def _run_stream(spark, tmp_path, files, name, gap=GAP):
    """Write `files` (list of row-chunks) as a time-ordered file stream,
    run sessionize_stream over it with availableNow/maxFilesPerTrigger=1,
    return {(user, session_id): row} excluding the sentinel user."""
    src = str(tmp_path / f"src_{name}")
    stage = str(tmp_path / f"stage_{name}")  # outside src: the file
    os.makedirs(src)                         # stream must only ever
    for i, chunk in enumerate(files):        # see f{i}.parquet
        p = os.path.join(src, f"f{i}.parquet")
        spark.createDataFrame(
            chunk, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), p)
        os.utime(p, (time.time() + i, time.time() + i))

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        sessionize_stream(stream, "user_id", "ts", gap, "value",
                          watermark=f"{gap} seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return {
        (r["user_id"], r["session_id"]): r.asDict()
        for r in spark.table(name).collect()
        if r["user_id"] != SENTINEL
    }


def test_streaming_matches_batch_and_times_out(spark, tmp_path):
    # 12 users x 30 events in 4 time slices; inter-arrival alternates
    # below/above the gap so every user has several multi-event sessions
    rows = []
    for u in range(12):
        t = u * 7
        for i in range(30):
            t += (GAP - 200) if (i + u) % 3 else (GAP + 500)
            rows.append((u, _ts(t), float(u + i)))
    last = max((r[1] - BASE).total_seconds() for r in rows)

    slices = sorted(rows, key=lambda r: r[1])
    n_files = 4
    per = (len(slices) + n_files - 1) // n_files
    files = [slices[i * per:(i + 1) * per] for i in range(n_files)]
    # two sentinel files advance the watermark far enough that every
    # real open session's event-time timeout fires before the stream ends
    files.append([(SENTINEL, _ts(last + 3 * GAP), 0.0)])
    files.append([(SENTINEL, _ts(last + 4 * GAP), 0.0)])
    got = _run_stream(spark, tmp_path, files, "sess_out")
    batch_df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    want = {
        (r["user_id"], r["session_id"]): r.asDict()
        for r in session_windows(
            batch_df, "user_id", "ts", GAP, "value"
        ).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for f in ("session_start_s", "session_end_s", "n_events", "total_value"):
            assert g[f] == w[f], (k, f, g, w)
    closed_by = {g["closed_by"] for g in got.values()}
    assert closed_by == {"gap", "timeout"}  # both close paths exercised
    # exactly one timeout-closed session per user: the final one
    timeouts = [k for k, g in got.items() if g["closed_by"] == "timeout"]
    assert len(timeouts) == 12


def test_timeout_then_revival_keeps_session_ordinal(spark, tmp_path):
    """A key whose open session times out and that later becomes active
    again must continue its session_id sequence (the timeout keeps the
    ordinal in state) — otherwise the stream emits a duplicate
    (key, session_id) and diverges from the batch operator."""
    u = 7
    files = [
        [(u, _ts(0), 1.0), (u, _ts(500), 2.0)],        # session 1
        [(SENTINEL, _ts(20000), 0.0)],                  # advance watermark
        [(SENTINEL, _ts(21000), 0.0)],                  # fire timeout 1
        [(u, _ts(30000), 3.0), (u, _ts(30400), 4.0)],   # session 2 (revival)
        [(SENTINEL, _ts(60000), 0.0)],                  # advance watermark
        [(SENTINEL, _ts(61000), 0.0)],                  # fire timeout 2
    ]
    got = _run_stream(spark, tmp_path, files, "sess_revival")
    assert set(got) == {(u, 1), (u, 2)}  # ordinal continued, no dup (u,1)
    assert got[(u, 1)]["closed_by"] == "timeout"
    assert got[(u, 2)]["closed_by"] == "timeout"
    assert got[(u, 2)]["session_start_s"] - got[(u, 1)]["session_start_s"] == 30000
    # and it still matches the batch answer on the union of the events
    rows = [r for chunk in files for r in chunk if r[0] == u]
    want = {
        (r["user_id"], r["session_id"]): r.asDict()
        for r in session_windows(
            spark.createDataFrame(rows, "user_id long, ts timestamp, value double"),
            "user_id", "ts", GAP, "value",
        ).collect()
    }
    for k in want:
        for f in ("session_start_s", "session_end_s", "n_events", "total_value"):
            assert got[k][f] == want[k][f]
