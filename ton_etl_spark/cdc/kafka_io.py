"""Kafka source/sink wiring for the CDC pipeline and the export relay.

The reference tails Debezium topics with kafka-python consumers
(parser/main.py:28-37: subscribe N topics, earliest reset, manual
commit) and re-publishes converted rows with a producer
(datalake/streaming.py:94-106). Here both ends are Structured
Streaming's Kafka connector:

  * source — `spark.readStream.format("kafka")`; offsets live in the
    checkpoint (replacing consumer-group commits), `startingOffsets=
    earliest` replicates KAFKA_OFFSET_RESET=earliest full replay;
  * envelope decode — the Kafka record value is the Debezium JSON body;
    `from_json` lifts it into the engine's flat change-event columns
    (the dunder-field strip of datalake/main.py:48 happens here);
  * sink — `writeStream.format("kafka")` with the row re-serialized to
    JSON in the value, keyed by the entity key for per-key topic order.

The sandbox has no broker or kafka jar, so `.load()`/`.start()` are not
exercised in tests; the OPTION WIRING and the envelope decode are pure
functions tested without one (tests/test_kafka_wiring.py). On a real
cluster, submit with
`--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>`.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import CHANGE_EVENT_SCHEMA


def kafka_source_options(
    bootstrap_servers: str,
    topics: str | list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Source options mirroring the reference consumer config
    (README.md:50-77 connector + parser/main.py:28-37):
    subscribe/earliest/batch-size-bound; `minPartitions` over-splits
    Kafka partitions across executors (the topic-partitions × replicas
    parallelism story, README.md:63,92-93)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics) if isinstance(topics, list) else topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        # maxOffsetsPerTrigger == the poll-batch bound (KAFKA_MAX_POLL_RECORDS)
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def kafka_stream_reader(spark: SparkSession, options: dict[str, str]):
    """A configured DataStreamReader (call .load() where a broker and the
    kafka jar exist)."""
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def decode_kafka_envelope(raw: DataFrame) -> DataFrame:
    """Kafka record batch -> change-event columns.

    `raw` has the Kafka source schema (key/value binary, topic,
    partition, offset, timestamp, timestampType). The value is the
    Debezium-unwrapped JSON object with dunder metadata fields
    (`__op`, `__table`, `__lsn`, `__source_ts_ms` — reference
    parser/main.py:68-71); they become real columns and the remaining
    body stays as the `payload` JSON for the per-event-type parsers."""
    v = F.col("value").cast("string")
    envelope = F.from_json(
        v,
        "`__op` string, `__table` string, `__lsn` bigint, "
        "`__source_ts_ms` bigint, repo string, path string",
    )
    return raw.select(
        envelope.getField("__lsn").alias("lsn"),
        envelope.getField("__source_ts_ms").alias("ts_ms"),
        envelope.getField("__op").alias("op"),
        # topic carries the table/event-type routing exactly like the
        # reference's PARSERS[msg.topic] dispatch (parsers/__init__.py:89)
        F.coalesce(
            envelope.getField("__table"),
            F.regexp_extract(F.col("topic"), r"([^.]+)$", 1),
        ).alias("event_type"),
        envelope.getField("repo").alias("repo"),
        envelope.getField("path").alias("path"),
        v.alias("payload"),
    )


def encode_kafka_output(
    df: DataFrame, key_cols: list[str], topic: str
) -> DataFrame:
    """Converted rows -> Kafka producer schema (key, value, topic).
    Keying by the entity key preserves per-key order within a topic
    partition — the property the reference relies on (SURVEY §2.11 T5)."""
    return df.select(
        F.concat_ws("\x00", *[F.col(c).cast("string") for c in key_cols]).alias(
            "key"
        ),
        F.to_json(F.struct(*df.columns)).alias("value"),
        F.lit(topic).alias("topic"),
    )


def kafka_sink_options(
    bootstrap_servers: str, checkpoint_dir: str
) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "checkpointLocation": checkpoint_dir,
    }


def change_event_stream(
    spark: SparkSession,
    source: str,
    event_dir: str | None = None,
    max_files_per_trigger: int = 4,
    kafka_options: dict[str, str] | None = None,
) -> DataFrame:
    """The pipeline's source switch: `files` (parquet event-log replay,
    the sandbox default and the debug-replay path S4) or `kafka`
    (production tail S1/S2). Both produce the same change-event columns,
    so everything downstream is source-agnostic — the reference shares
    its parse path between live Kafka and DB replay the same way
    (parser/main.py:49-54)."""
    if source == "files":
        return (
            spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(event_dir)
        )
    if source == "kafka":
        raw = kafka_stream_reader(spark, kafka_options or {}).load()
        return decode_kafka_envelope(raw)
    raise ValueError(f"unknown source {source!r} (expected 'files' or 'kafka')")


def make_kafka_record(event: dict) -> tuple[bytes, bytes]:
    """Test helper: serialize one change event the way Debezium's
    connector would put it on the wire (JSON value with dunder fields)."""
    try:
        body = dict(json.loads(event.get("payload") or "{}"))
    except (json.JSONDecodeError, TypeError, ValueError):
        # corrupt payload: ship it opaquely; the parser's NonCritical
        # contract flags the row malformed downstream
        body = {"__corrupt_payload": event.get("payload")}
    body.update(
        {
            "__op": event["op"],
            "__table": event["event_type"],
            "__lsn": event["lsn"],
            "__source_ts_ms": event.get("ts_ms"),
            "repo": event.get("repo"),
            "path": event.get("path"),
        }
    )
    key = f"{event.get('repo')}\x00{event.get('path')}".encode()
    return key, json.dumps(body, separators=(",", ":")).encode()
