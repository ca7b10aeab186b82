"""Tumbling-window rollup: one function, two execution modes.

The streaming run (file source, one file per trigger, watermark) must
emit exactly the batch run's rows over the non-late events — and must
DROP a late event that arrives after the watermark passed its window,
which the batch twin over the reduced row set makes checkable.
"""

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from ton_etl_spark.streaming.windows import windowed_rollup

BASE = dt.datetime(2024, 1, 1)
SENTINEL_KEY = "__sentinel__"
HOUR = 3600


def _ts(s):
    return BASE + dt.timedelta(seconds=s)


def _run_stream(spark, tmp_path, files, name):
    src = str(tmp_path / f"src_{name}")
    stage = str(tmp_path / f"stage_{name}")
    os.makedirs(src)
    for i, chunk in enumerate(files):
        p = os.path.join(src, f"f{i}.parquet")
        spark.createDataFrame(
            chunk, "event_type string, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), p)
        os.utime(p, (time.time() + i, time.time() + i))

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        windowed_rollup(stream, "ts", "event_type", "value",
                        window_len="1 hour", watermark="30 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return {
        (r["window_start_s"], r["event_type"]): r.asDict()
        for r in spark.table(name).collect()
        if r["event_type"] != SENTINEL_KEY
    }


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    return {
        (r["window_start_s"], r["event_type"]): r.asDict()
        for r in windowed_rollup(
            df, "ts", "event_type", "value", window_len="1 hour"
        ).collect()
    }


def test_batch_hand_values(spark):
    rows = [("a", _ts(10), 1.5), ("a", _ts(3599), 2.0),
            ("a", _ts(3600), 4.0), ("b", _ts(100), 7.0)]
    out = _batch(spark, rows)
    base = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    # local-session timezone may shift the epoch rendering; anchor on
    # the window of the first row instead of an absolute constant
    w0 = min(k[0] for k in out)
    assert out[(w0, "a")]["n_events"] == 2
    assert out[(w0, "a")]["sum_value"] == 3.5
    assert out[(w0 + HOUR, "a")]["n_events"] == 1
    assert out[(w0, "b")]["sum_value"] == 7.0
    assert (w0 - base) % HOUR == 0


def test_streaming_matches_batch_and_drops_late(spark, tmp_path):
    # 3 keys x events spread over 5 hours, shipped in 4 time slices
    rows = []
    for ki, key in enumerate(["a", "b", "c"]):
        for i in range(40):
            rows.append((key, _ts(i * 450 + ki * 37), float(i + ki)))
    rows.sort(key=lambda r: r[1])
    per = (len(rows) + 3) // 4
    files = [rows[i * per:(i + 1) * per] for i in range(4)]

    # a LATE row: event-time in hour 0, delivered after the stream has
    # seen hour-5 data (watermark 30 min => hour-0 window long closed)
    late = ("a", _ts(200), 1000.0)
    files.append([late])
    # sentinels push the watermark past every real window's end so all
    # remaining open windows emit before availableNow drains
    last = max((r[1] - BASE).total_seconds() for r in rows)
    files.append([(SENTINEL_KEY, _ts(last + 3 * HOUR), 0.0)])
    files.append([(SENTINEL_KEY, _ts(last + 4 * HOUR), 0.0)])

    got = _run_stream(spark, tmp_path, files, "winroll")
    want = _batch(spark, rows)  # batch over the NON-late rows only
    assert got == want
    # sanity: the late row would have changed its window had it landed
    with_late = _batch(spark, rows + [late])
    assert with_late != want
