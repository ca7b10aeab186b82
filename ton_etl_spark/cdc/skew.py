"""Streaming hot-key detection (frequency sketch) for merge-shuffle salting.

The reference's only skew story is raising Kafka message limits for
mega account states (README.md:30-39); the north rule requires explicit
detection + salting. We use Spark's built-in frequent-items sketch
(`DataFrame.stat.freqItems`, the Karp-Shenker-Papadimitriou one-pass
algorithm) over a sample of the batch: any key exceeding the support
threshold triggers two-phase (salted) pre-aggregation in the merge
(lake/merge.py::dedup_updates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KEY_SEP = "\x00"


def detect_hot_keys(
    df: DataFrame,
    keys: list[str],
    support: float = 0.05,
    sample_fraction: float = 0.2,
) -> list[str]:
    s = df if sample_fraction >= 1.0 else df.sample(fraction=sample_fraction, seed=7)
    s = s.withColumn("_k", F.concat_ws(KEY_SEP, *[F.col(k) for k in keys]))
    row = s.stat.freqItems(["_k"], support=support).collect()[0]
    items = row[0] or []
    # freqItems over-approximates; keep it cheap and treat any hit as
    # "salting worthwhile" — salting a non-skewed batch is merely one
    # extra tiny shuffle stage.
    return [i for i in items if i]


class HotKeyMonitor:
    """Caches the salting decision across micro-batches, refreshing every
    `refresh_every` batches (the reference refreshes its in-memory dim
    caches on a cadence too, tvl.py:27-31)."""

    def __init__(self, keys: list[str], support: float = 0.05,
                 refresh_every: int = 8, salt: int = 16):
        self.keys = keys
        self.support = support
        self.refresh_every = refresh_every
        self.salt_value = salt
        self._n_seen = 0
        self._active_salt: int | None = None
        self.hot_keys: list[str] = []

    def salt_for(self, batch_df: DataFrame) -> int | None:
        if self._n_seen % self.refresh_every == 0:
            self.hot_keys = detect_hot_keys(batch_df, self.keys, self.support)
            self._active_salt = self.salt_value if self.hot_keys else None
        self._n_seen += 1
        return self._active_salt
