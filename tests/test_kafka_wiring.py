"""Kafka source/sink wiring, tested without a broker: option
construction, the Debezium envelope decode over a batch shaped like the
Kafka source output, and the producer-side encode."""

import dataclasses
import json

from pyspark.sql import functions as F, types as T

from ton_etl_spark.cdc.kafka_io import (
    decode_kafka_envelope,
    encode_kafka_output,
    kafka_sink_options,
    kafka_source_options,
    make_kafka_record,
)
from ton_etl_spark.datagen import GenParams, generate_events


def test_source_options_mirror_reference_consumer():
    opts = kafka_source_options(
        "broker1:9092,broker2:9092",
        ["ton.public.file_upsert", "ton.public.file_delete"],
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
        min_partitions=40,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "ton.public.file_upsert,ton.public.file_delete",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "50000",
        "minPartitions": "40",
    }
    assert kafka_sink_options("b:9092", "/cp") == {
        "kafka.bootstrap.servers": "b:9092",
        "checkpointLocation": "/cp",
    }


KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def test_envelope_decode_matches_file_source(spark):
    """The same generated events, delivered as Kafka records, must decode
    to the same change-event rows the file source yields."""
    events = generate_events(GenParams(n_events=300, n_repos=6, n_files=1))
    rows = []
    for e in events[:200]:
        d = dataclasses.asdict(e)
        key, value = make_kafka_record(d)
        rows.append((key, value, f"ton.public.{e.event_type}", 0, 0, None, 0))
    raw = spark.createDataFrame(rows, KAFKA_SCHEMA)
    decoded = {r["lsn"]: r.asDict() for r in decode_kafka_envelope(raw).collect()}

    for e in events[:200]:
        got = decoded[e.lsn]
        assert got["op"] == e.op
        assert got["event_type"] == e.event_type
        assert got["repo"] == e.repo and got["path"] == e.path
        assert got["ts_ms"] == e.ts_ms
        if e.payload and e.event_type == "file_upsert" and "content_z" in e.payload:
            # body fields survive inside the payload JSON
            body = json.loads(got["payload"])
            orig = json.loads(e.payload)
            assert body["content_z"] == orig["content_z"]


def test_envelope_decode_feeds_parsers(spark):
    """End-to-end through the vectorized upsert parser: Kafka-delivered
    records decode to the same content as the original payloads."""
    from ton_etl_spark.cdc.parsers import parse_file_upserts
    from ton_etl_spark.oracle import _decode_upsert

    events = [
        e for e in generate_events(GenParams(n_events=300, n_repos=6, n_files=1))
        if e.event_type == "file_upsert"
    ][:50]
    rows = [
        make_kafka_record(dataclasses.asdict(e))
        + (f"ton.public.{e.event_type}", 0, 0, None, 0)
        for e in events
    ]
    raw = spark.createDataFrame(rows, KAFKA_SCHEMA)
    parsed = parse_file_upserts(decode_kafka_envelope(raw)).collect()
    by_lsn = {r["lsn"]: r for r in parsed}
    for e in events:
        expect = _decode_upsert(e.payload)
        got = by_lsn[e.lsn]
        if expect is None:
            assert got["_malformed"]
        else:
            assert got["content"] == expect["content"]
            assert got["size_bytes"] == expect["size_bytes"]


def test_encode_kafka_output_roundtrip(spark):
    df = spark.createDataFrame(
        [("r1", "p1", 5, "hello")], "repo string, path string, lsn long, content string"
    )
    out = encode_kafka_output(df, ["repo", "path"], "streaming_files").collect()[0]
    assert out["topic"] == "streaming_files"
    assert out["key"] == "r1\x00p1"
    assert json.loads(out["value"]) == {
        "repo": "r1", "path": "p1", "lsn": 5, "content": "hello"
    }