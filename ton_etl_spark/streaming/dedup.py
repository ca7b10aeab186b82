"""Watermark-bounded duplicate suppression — the streaming twin of the
batch event dedup, through one function so parity is by construction.

Reference parity: the reference's Kafka consumers are at-least-once, so
every downstream insert is idempotent (`ON CONFLICT DO NOTHING`,
reference db.py:197-214) — duplicate deliveries are absorbed by the
sink. Here the suppression is an explicit operator ahead of the sink:
`dropDuplicatesWithinWatermark` keeps the first arrival of each event
identity and drops redeliveries that land within the watermark bound.

Scale shape: state holds one entry per DISTINCT key seen within the
watermark horizon and is evicted as event time advances — bounded by
(key arrival rate x watermark), independent of stream length. A plain
streaming `dropDuplicates` would keep every key forever and OOM on an
unbounded CDC tail; the watermark variant is the only shape that
survives at 100 TB. The one shuffle is on the dedup keys. Redelivery
AFTER the watermark horizon may re-emit — by then the LSN-guarded
merge sink absorbs it (idempotence in depth, same layering as the
reference's consumer + ON CONFLICT pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-arrival-wins dedup on `key_cols`.

    Streaming input: watermark-bounded state (`dropDuplicatesWithinWatermark`).
    Batch input: the identical contract in one pass (`dropDuplicates`).
    With byte-identical redeliveries (the at-least-once case this
    guards), both twins emit exactly the same rows.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)
