"""Streaming observability — the engine's analogue of the reference's
throughput logging ("X.XX Kafka messages per second", parser/main.py:
76-81, every LOG_INTERVAL=10 s) and per-flush exporter metrics
(datalake/main.py:155).

A StreamingQueryListener captures per-micro-batch progress (rows/sec,
batch duration, source offsets) and appends JSON lines to a file next
to the checkpoint; combined with the LakeTable's per-commit metrics
rows (_metrics/v*.json) this gives the north rule's "metrics written
alongside each microbatch" from both the source and the sink side.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    def __init__(self, out_path: str):
        self.out_path = out_path
        os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
                "timestamp": p.timestamp,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {"event": "terminated", "id": str(event.id),
             "exception": event.exception}
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def _write(self, obj: dict) -> None:
        with open(self.out_path, "a") as f:
            f.write(json.dumps(obj) + "\n")


def attach_metrics_listener(spark: SparkSession, out_path: str) -> BatchMetricsListener:
    listener = BatchMetricsListener(out_path)
    spark.streams.addListener(listener)
    return listener
