"""Unit tests of the merge kernel: LSN dedup, LWW guards, tombstones,
salting parity, strategy equivalence, schema evolution reads."""

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.lake.merge import dedup_updates, merge_into
from ton_etl_spark.lake.table import LakeTable
from ton_etl_spark.schemas import REPOS_KEY_FIELDS, REPOS_SCHEMA


UPD_SCHEMA = (
    "repo string, path string, lsn long, op string, commit string, "
    "lang string, content string, size_bytes int"
)


def mk_table(spark, tmp_path, name="t", buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / name), REPOS_SCHEMA, REPOS_KEY_FIELDS,
        "lsn", bucket_count=buckets,
    )


def upd(spark, rows):
    return spark.createDataFrame(
        [
            (r.get("repo", "r1"), r.get("path", "p1"), r["lsn"], r.get("op", "u"),
             r.get("commit"), r.get("lang"), r.get("content"), r.get("size"))
            for r in rows
        ],
        UPD_SCHEMA,
    )


def live(table):
    return {
        (r["repo"], r["path"]): (r["lsn"], r["content"])
        for r in table.read().collect()
    }


# -- dedup ------------------------------------------------------------------

@pytest.mark.parametrize("salt", [None, 4])
def test_dedup_picks_max_lsn_deterministically(spark, salt):
    rows = [
        {"lsn": 5, "op": "u", "content": "v5"},
        {"lsn": 9, "op": "u", "content": "v9"},
        {"lsn": 9, "op": "u", "content": "v9"},   # duplicate delivery
        {"lsn": 7, "op": "d"},
        {"lsn": 2, "op": "c", "content": "v2"},
    ]
    df = upd(spark, rows).withColumn(
        "_op_rank",
        F.when(F.col("op") == "d", 3).when(F.col("op") == "u", 2)
        .when(F.col("op") == "c", 1).otherwise(0),
    ).withColumn("_deleted", F.col("op") == "d")
    out = dedup_updates(
        df, ["repo", "path"], "lsn",
        ["commit", "lang", "content", "size_bytes", "_deleted"], salt=salt,
    ).collect()
    assert len(out) == 1
    assert out[0]["lsn"] == 9 and out[0]["content"] == "v9"


# -- LWW / tombstones -------------------------------------------------------

def test_lww_guard_and_tombstones(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    merge_into(t, upd(spark, [{"lsn": 10, "op": "c", "content": "a"}]))
    # stale update loses
    merge_into(t, upd(spark, [{"lsn": 5, "op": "u", "content": "stale"}]))
    assert live(t)[("r1", "p1")] == (10, "a")
    # delete wins with newer lsn, leaves a tombstone
    merge_into(t, upd(spark, [{"lsn": 20, "op": "d"}]))
    assert ("r1", "p1") not in live(t)
    dead = t.read(include_deleted=True).collect()
    assert len(dead) == 1 and dead[0]["_deleted"] and dead[0]["lsn"] == 20
    # late pre-delete event cannot resurrect the key
    merge_into(t, upd(spark, [{"lsn": 15, "op": "u", "content": "ghost"}]))
    assert ("r1", "p1") not in live(t)
    # genuinely newer insert revives it
    merge_into(t, upd(spark, [{"lsn": 30, "op": "c", "content": "reborn"}]))
    assert live(t)[("r1", "p1")] == (30, "reborn")


def test_equal_lsn_keeps_target(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    merge_into(t, upd(spark, [{"lsn": 10, "op": "c", "content": "first"}]))
    merge_into(t, upd(spark, [{"lsn": 10, "op": "u", "content": "dup"}]))
    assert live(t)[("r1", "p1")] == (10, "first")  # strict `<` guard


# -- strategy equivalence ---------------------------------------------------

def test_broadcast_and_union_agg_agree(spark, tmp_path, monkeypatch):
    rows = [
        {"repo": f"r{i % 3}", "path": f"p{i}", "lsn": 100 + i, "op": "c",
         "content": f"c{i}"}
        for i in range(50)
    ] + [{"repo": "r0", "path": "p0", "lsn": 500, "op": "d"}]

    t1 = mk_table(spark, tmp_path, "bcast")
    merge_into(t1, upd(spark, rows))

    import ton_etl_spark.lake.merge as M
    monkeypatch.setattr(M, "BROADCAST_KEY_LIMIT", 0)  # force union_agg
    t2 = mk_table(spark, tmp_path, "uagg")
    res = merge_into(t2, upd(spark, rows))
    assert res["strategy"] == "union_agg"
    assert live(t1) == live(t2)


def test_broadcast_byte_bound_forces_union_agg(spark, tmp_path, monkeypatch):
    """The broadcast strategy is gated on estimated key BYTES, not just
    row count: at the boundary the same batch flips strategy and the
    results stay identical."""
    import ton_etl_spark.lake.merge as M

    # seed a fat table so affected_rows > 4 * n_keys (broadcast-eligible)
    base = [
        {"repo": "r0", "path": f"seed{i}", "lsn": i + 1, "op": "c",
         "content": f"s{i}"}
        for i in range(200)
    ]
    batch = [
        {"repo": "r0", "path": "seed5", "lsn": 900, "op": "u", "content": "n5"},
        {"repo": "r0", "path": "seed6", "lsn": 901, "op": "u", "content": "n6"},
    ]

    t1 = mk_table(spark, tmp_path, "wide_cap")
    merge_into(t1, upd(spark, base))
    r1 = merge_into(t1, upd(spark, batch))
    assert r1["strategy"] == "broadcast"

    # shrink the byte cap below ~2 keys * (width + overhead)
    monkeypatch.setattr(M, "BROADCAST_BYTES_CAP", 16)
    t2 = mk_table(spark, tmp_path, "tiny_cap")
    merge_into(t2, upd(spark, base))
    r2 = merge_into(t2, upd(spark, batch))
    assert r2["strategy"] == "union_agg"
    assert live(t1) == live(t2)


# -- salting parity ---------------------------------------------------------

def test_salted_merge_parity(spark, tmp_path):
    # hot key with many versions + long tail; salted and unsalted runs
    # must be byte-identical (north rule: salt affects only the shuffle)
    rows = [
        {"repo": "hot", "path": "k", "lsn": i, "op": "u", "content": f"v{i}"}
        for i in range(1, 300)
    ] + [
        {"repo": f"r{i}", "path": "p", "lsn": 1000 + i, "op": "c",
         "content": f"x{i}"}
        for i in range(40)
    ]
    t1 = mk_table(spark, tmp_path, "nosalt")
    merge_into(t1, upd(spark, rows), salt=None)
    t2 = mk_table(spark, tmp_path, "salted")
    merge_into(t2, upd(spark, rows), salt=16)
    assert live(t1) == live(t2)
    assert live(t1)[("hot", "k")] == (299, "v299")


# -- schema evolution reads -------------------------------------------------

def test_widen_and_add_read_old_files(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    merge_into(
        t, upd(spark, [{"lsn": 1, "op": "c", "content": "old", "size": 7}])
    )
    t.widen_column("size_bytes", "bigint")
    t.add_column("stars", "bigint")
    t.rename_column("lang", "language")
    # old parquet file has int32 size_bytes, no stars, field-id lang
    row = t.read().collect()[0]
    assert row["size_bytes"] == 7 and row["stars"] is None
    assert "language" in t.read().columns
    # new write at the widened type
    big = 6_000_000_000
    df = spark.createDataFrame(
        [("r1", "p2", 2, "c", None, None, "new", big, 5)],
        "repo string, path string, lsn long, op string, commit string, "
        "language string, content string, size_bytes long, stars long",
    )
    merge_into(t, df)
    vals = {r["path"]: r["size_bytes"] for r in t.read().collect()}
    assert vals == {"p1": 7, "p2": big}
