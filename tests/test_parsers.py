"""Golden-fixture tests of the vectorized parsers (reference pattern:
nfts_parser_test.py base64-payload fixtures; swap_volume_test.py
parametrized pure-function tables)."""

import base64
import zlib

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.cdc.parsers import parse_file_upserts
from ton_etl_spark.datagen import GenParams, encode_payload, row_fields
from ton_etl_spark.schemas import CHANGE_EVENT_SCHEMA


def mk_events(spark, rows):
    return spark.createDataFrame(
        [
            (r.get("lsn", 1), 0, r.get("op", "c"), "file_upsert",
             r.get("repo", "r"), r.get("path", "p"), r["payload"])
            for r in rows
        ],
        CHANGE_EVENT_SCHEMA,
    )


def test_decode_roundtrip_golden(spark):
    payload = encode_payload("orgA/x", "src/a.py", 42, True, False, False)
    expected = row_fields("orgA/x", "src/a.py", 42, False)
    out = parse_file_upserts(
        mk_events(spark, [{"payload": payload, "lsn": 42}])
    ).collect()[0]
    assert not out["_malformed"]
    assert out["content"] == expected["content"]
    assert out["commit"] == expected["commit"]
    assert out["lang"] == expected["lang"]
    assert out["size_bytes"] == expected["size_bytes"]
    assert out["stars"] == expected["stars"]


def test_post_rename_payload_maps_to_language_col(spark):
    payload = encode_payload("orgA/x", "src/a.py", 99, True, True, True)
    out = parse_file_upserts(
        mk_events(spark, [{"payload": payload, "lsn": 99}]), "language"
    ).collect()[0]
    assert out["language"] == row_fields("orgA/x", "src/a.py", 99, True)["lang"]


@pytest.mark.parametrize(
    "payload",
    [
        '{"commit": "CORRUPT',                        # truncated JSON
        '{"commit":"c","content_z":"!!!notb64!!!"}',  # bad base64
        '{"commit":"c","content_z":"' + base64.b64encode(b"not-zlib").decode() + '"}',
        None,
    ],
)
def test_malformed_rows_flagged_not_fatal(spark, payload):
    good = encode_payload("r", "p", 7, False, False, False)
    df = parse_file_upserts(
        mk_events(spark, [{"payload": payload, "lsn": 1},
                          {"payload": good, "lsn": 7}])
    )
    rows = {r["lsn"]: r for r in df.collect()}
    assert rows[1]["_malformed"] and not rows[7]["_malformed"]


@pytest.mark.parametrize(
    "value,scale,expected",
    [
        (123, 0, 123),
        (123456, 2, 1234),           # floor(123456 / 100)
        (-5000, 3, -5),
        (6_000_000_000, 0, 6_000_000_000),   # beyond int32
        (2**80, 0, None),             # beyond int64 -> null, not a crash
    ],
)
def test_debezium_decimal_decode(spark, value, scale, expected):
    from ton_etl_spark.cdc.parsers import debezium_int

    nbytes = max(1, (value.bit_length() + 8) // 8)
    b64 = base64.b64encode(value.to_bytes(nbytes, "big", signed=True)).decode()
    df = spark.createDataFrame([(b64, scale)], "v string, s int")
    got = df.select(debezium_int("v", "s").alias("x")).collect()[0]["x"]
    assert got == expected
