"""Incremental change feed (`LakeTable.read_changes`) + manifest
file_stats: exactness vs a full-scan oracle, file skipping on the
steady-state poll, tombstone visibility, stats survival across
maintenance rewrites, and the no-stats legacy fallback.

The reference exposes increments as Kafka topics re-consumed by
downstream datamarts (README.md dwh/datamarts flow); here the lake
itself serves the cursor contract: rows with LSN > cursor, deletes
included, scanning only files whose recorded LSN range crosses the
cursor (Iceberg-manifest-style column stats)."""

import json
import os

from pyspark.sql import functions as F

from ton_etl_spark.lake.merge import merge_into

from test_merge_unit import mk_table, upd, live


def _feed(table, since):
    return {
        (r["repo"], r["path"]): (r["lsn"], bool(r["_deleted"]))
        for r in table.read_changes(since).collect()
    }


def test_read_changes_exact_and_file_skipping(spark, tmp_path):
    t = mk_table(spark, tmp_path, buckets=8)
    # batch 1: 40 keys spread over all buckets
    merge_into(t, upd(spark, [
        {"repo": f"r{i % 5}", "path": f"p{i}", "lsn": i + 1, "op": "c",
         "content": f"v{i}"}
        for i in range(40)
    ]))
    full_files = len(t.read().inputFiles())
    # steady-state poll: cursor at head -> nothing new, zero files scanned
    assert _feed(t, since=40) == {}
    assert len(t.read_changes(40).inputFiles()) == 0

    # batch 2: touch ONE key -> one bucket rewritten
    merge_into(t, upd(spark, [
        {"repo": "r0", "path": "p0", "lsn": 100, "op": "u", "content": "new"}
    ]))
    changes = _feed(t, since=40)
    assert changes == {("r0", "p0"): (100, False)}
    # oracle: full scan + row filter gives the same rows
    oracle = {
        (r["repo"], r["path"]): (r["lsn"], bool(r["_deleted"]))
        for r in t.read(include_deleted=True).filter(F.col("lsn") > 40).collect()
    }
    assert changes == oracle
    # file skipping: only the rewritten bucket's files are scanned
    scanned = len(t.read_changes(40).inputFiles())
    assert 0 < scanned < full_files

    # deletes are visible in the feed
    merge_into(t, upd(spark, [{"repo": "r1", "path": "p1", "lsn": 200, "op": "d"}]))
    changes = _feed(t, since=100)
    assert changes == {("r1", "p1"): (200, True)}
    assert ("r1", "p1") not in live(t)


def test_file_stats_survive_maintenance_and_track_manifest(spark, tmp_path):
    t = mk_table(spark, tmp_path, buckets=4)
    merge_into(t, upd(spark, [
        {"repo": f"r{i}", "path": f"p{i}", "lsn": i + 1, "op": "c", "content": "x"}
        for i in range(20)
    ]))
    merge_into(t, upd(spark, [
        {"repo": "r0", "path": "p0", "lsn": 50, "op": "u", "content": "y"}
    ]))
    t.compact(max_files=1)
    m = t.manifest()
    manifest_files = {p for fl in m["buckets"].values() for p in fl}
    # stats cover exactly the live file set, with sane LSN ranges
    assert set(m["file_stats"]) == manifest_files
    for rows, vmin, vmax in m["file_stats"].values():
        assert rows > 0 and 1 <= vmin <= vmax <= 50
    # feed still exact after the rewrite (compaction must not re-surface
    # old rows: their LSNs are unchanged)
    assert _feed(t, since=20) == {("r0", "p0"): (50, False)}


def test_read_changes_without_stats_falls_back_to_full_scan(spark, tmp_path):
    t = mk_table(spark, tmp_path, buckets=4)
    merge_into(t, upd(spark, [
        {"repo": f"r{i}", "path": f"p{i}", "lsn": i + 1, "op": "c", "content": "x"}
        for i in range(10)
    ]))
    # simulate a pre-stats manifest
    v = t.current_version()
    mp = os.path.join(str(tmp_path / "t"), "_versions", f"v{v}.json")
    with open(mp) as f:
        m = json.load(f)
    m.pop("file_stats", None)
    with open(mp, "w") as f:
        json.dump(m, f)
    # no pruning possible, but the result is still exact
    assert _feed(t, since=8) == {
        ("r8", "p8"): (9, False), ("r9", "p9"): (10, False),
    }
    assert len(t.read_changes(8).inputFiles()) == len(t.read().inputFiles())


# -- ChangeFeedConsumer: the downstream-datamart pattern ---------------------

def _mirror_into(downstream):
    def fn(feed):
        upd = feed.withColumn(
            "op", F.when(F.col("_deleted"), "d").otherwise("u")
        ).drop("_deleted")
        merge_into(downstream, upd)
    return fn


def test_consumer_mirrors_table_and_survives_lost_cursor(spark, tmp_path):
    from ton_etl_spark.lake import ChangeFeedConsumer

    main = mk_table(spark, tmp_path, name="main")
    down = mk_table(spark, tmp_path, name="down")
    consumer = ChangeFeedConsumer(main, str(tmp_path / "cursor"))

    merge_into(main, upd(spark, [
        {"repo": "r1", "path": f"p{i}", "lsn": i + 1, "op": "c", "content": f"v{i}"}
        for i in range(10)
    ]))
    r = consumer.poll(_mirror_into(down))
    assert r["delivered"] and r["cursor"] == main.current_version()
    assert live(down) == live(main)

    # idle poll: nothing new, no downstream commit, no scan
    v_down = down.current_version()
    r = consumer.poll(_mirror_into(down))
    assert not r["delivered"] and down.current_version() == v_down

    # an update and a delete flow through, tombstone visible downstream
    merge_into(main, upd(spark, [
        {"repo": "r1", "path": "p0", "lsn": 20, "op": "u", "content": "new"},
        {"repo": "r1", "path": "p1", "lsn": 21, "op": "d"},
    ]))
    r = consumer.poll(_mirror_into(down))
    assert r["delivered"] and r["cursor"] == main.current_version()
    assert live(down) == live(main)
    assert ("r1", "p1") not in live(down)

    # a brand-new key arriving LATE with a LOW LSN (out-of-order
    # delivery): an LSN-watermark feed would skip it forever; the
    # version cursor tracks commits, so it flows through
    merge_into(main, upd(spark, [
        {"repo": "r9", "path": "late", "lsn": 1, "op": "c", "content": "late"},
    ]))
    r = consumer.poll(_mirror_into(down))
    assert r["delivered"]
    assert live(down)[("r9", "late")] == (1, "late")
    assert live(down) == live(main)

    # crash AFTER fn, BEFORE cursor commit: rewind the cursor to simulate
    # the lost commit; redelivery (including carried rows from rewritten
    # buckets) is absorbed by the LSN-guarded merge (at-least-once +
    # idempotent sink = exactly-once downstream)
    consumer._commit_cursor(1)
    before = live(down)
    r = consumer.poll(_mirror_into(down))
    assert r["delivered"] and r["cursor"] == main.current_version()
    assert live(down) == before == live(main)


def test_version_changes_scans_only_new_commit_files(spark, tmp_path):
    import pytest

    t = mk_table(spark, tmp_path, buckets=8)
    merge_into(t, upd(spark, [
        {"repo": f"r{i % 5}", "path": f"p{i}", "lsn": i + 1, "op": "c",
         "content": f"v{i}"}
        for i in range(40)
    ]))
    merge_into(t, upd(spark, [
        {"repo": "r0", "path": "p0", "lsn": 100, "op": "u", "content": "new"}
    ]))
    feed = t.read_version_changes(1)
    # only the second commit's files are read (one rewritten bucket)
    files = feed.inputFiles()
    assert files and all("/data/v2/" in f for f in files)
    rows = {(r["repo"], r["path"]): r["lsn"] for r in feed.collect()}
    assert rows[("r0", "p0")] == 100
    # carried rows of the rewritten bucket ride along (absorbed downstream)
    assert len(rows) == feed.count() < 41

    # DDL commits write no files and contribute nothing to the feed
    t.add_column("notes", "string")
    assert t.read_version_changes(2).count() == 0
    assert len(t.read_version_changes(2).inputFiles()) == 0

    # vacuum bounds the feed horizon with a clear re-bootstrap error
    t.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="re-bootstrap"):
        t.read_version_changes(0)
