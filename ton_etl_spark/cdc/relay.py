"""Streaming export relay — the datalake-exporter / public-topic path.

The reference runs (a) an Avro exporter that buffers converted events
and flushes date-partitioned files to S3 (datalake/main.py:135-158, K4)
and (b) a relay that re-publishes converted rows to public
`streaming_*` Kafka topics (datalake/streaming.py:94-106, K5). Both
collapse into one Structured Streaming query here: readStream ->
converter projection (P1/P5: rename/decode/round into the export
model) -> append-mode partitioned parquet sink with checkpointed
exactly-once file commits. The reference's two-phase
adding_date -> block_date repartition dance (repartition.py) is
unnecessary: the event-date partition is computed at write time
(SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import CHANGE_EVENT_SCHEMA
from .parsers import parse_file_upserts


def convert_for_export(events: DataFrame) -> DataFrame:
    """Converter projection into the public export model (P1): decoded
    upserts only (`__op` in c/r/u — datalake/main.py:175), canonical
    column names, content hash, block_date partition column (E5/E6)."""
    ups = events.filter(
        (F.col("event_type") == "file_upsert") & F.col("op").isin("c", "r", "u")
    )
    decoded = parse_file_upserts(ups, "lang")
    return (
        decoded.filter(~F.col("_malformed"))
        .drop("_malformed")
        .withColumns(
            {
                "content_sha": F.sha2("content", 256),
                # event-time date partition (converter.py:32-33 bucketing;
                # synthetic ts_ms is an offset from a fixed base epoch)
                "block_date": F.date_format(
                    F.timestamp_millis(F.col("ts_ms") + F.lit(1_700_000_000_000)),
                    "yyyyMMdd",
                ),
            }
        )
    )


def run_relay(
    spark: SparkSession,
    event_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 4,
    sink: str = "parquet",                # 'parquet' | 'parquet_cas' | 'kafka'
    kafka_bootstrap: str | None = None,
    kafka_topic: str = "streaming_files",
) -> None:
    """sink='parquet' is the Avro-file-exporter analogue (K4);
    sink='parquet_cas' adds the reference's sha256 content-addressed
    file naming (datalake/main.py:144-150: `<sha256(bytes)[:32]>.avro`
    under a date partition) via the distributed CAS writer
    (cas_export.py) inside foreachBatch — redelivered batches rewrite
    identical names (no-op) and the manifest guard skips them outright;
    sink='kafka' is the public-topic producer relay (K5,
    datalake/streaming.py:94-106) — rows keyed by (repo, path) so
    per-key order survives topic partitioning."""
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(event_dir)
    )
    converted = convert_for_export(stream)
    if sink == "kafka":
        from .kafka_io import encode_kafka_output, kafka_sink_options

        out = encode_kafka_output(converted, ["repo", "path"], kafka_topic)
        writer = out.writeStream.format("kafka")
        for k, v in kafka_sink_options(kafka_bootstrap or "", checkpoint_dir).items():
            writer = writer.option(k, v)
        writer = writer.outputMode("append")
    elif sink == "parquet_cas":
        from .cas_export import cas_export

        def write_batch(batch_df, batch_id):
            cas_export(
                convert_for_export(batch_df), out_dir, "block_date",
                batch_id=batch_id,
            )

        # converter runs INSIDE foreachBatch; the stream stays raw so
        # the checkpoint offsets commit against the source schema only
        writer = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
    else:
        writer = (
            converted
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .partitionBy("block_date")
            .outputMode("append")
        )
    q = writer.trigger(availableNow=True).start() if available_now else writer.start()
    q.awaitTermination()
