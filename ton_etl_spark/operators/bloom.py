"""Deterministic, engine-independent Bloom filter as a Spark plan
constant — the broadcast-prefilter building block for join-heavy
membership checks (decontamination, blacklists, dedup probes).

Why not `DataFrame.stat.bloomFilter` / Spark's runtime row-group
filtering: those produce JVM-side sketches whose bit layout is opaque
to the plan author and whose injection points Spark chooses. Here the
filter is an explicit `array<bigint>` literal built with xxhash64 —
deterministic across partitionings and cluster sizes (the BASELINE.json
parity rule), inspectable, and usable inside any expression with zero
Python in the hot path.

Scale shape (100 TB): the bit array is the ONLY driver-materialized
piece and is hard-bounded (default 2^27 bits = 16 MiB as 2^21 longs);
the build is one explode + one `bit_or` aggregation over the key set
(map-side partial agg shrinks it to <= m/64 rows per partition), and
the probe is pure whole-stage-codegen arithmetic — n_hashes xxhash64
calls + array indexing per row, no shuffle, no UDF.

A Bloom filter NEVER false-negatives, so using `contains()` as a
PREFILTER in front of an exact join keeps the final result
byte-identical to the unfiltered plan — the pattern `decontaminate
(bloom_prefilter=True)` ships: false positives (rate ~ (1 - e^{-kn/m})^k,
about 1% at the default 10 bits/key, k=4) merely leak a few extra rows
into the exact verify join.
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS_PER_KEY = 10
DEFAULT_N_HASHES = 4  # near-optimal for 10 bits/key among int k <= 8
MAX_BITS_DEFAULT = 1 << 27  # 16 MiB of plan constant


def _positions(key: Column, m: int, n_hashes: int) -> list[Column]:
    # hash family: xxhash64 seeded by the probe index through the first
    # argument — one 64-bit hash per probe, reduced mod m (m a power of
    # two, so pmod is a mask in codegen)
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(m)) for i in range(n_hashes)
    ]


@dataclass(frozen=True)
class BloomFilter:
    """An immutable bit set: `words[i]` holds bits [64i, 64i+64)."""

    words: tuple[int, ...]
    m: int
    n_hashes: int
    n_keys: int

    def contains(self, key: Column) -> Column:
        """JVM-only membership predicate (true => maybe present, false
        => definitely absent). The words literal appears once per probe
        in the plan; codegen folds it to a shared constant array."""
        lit_words = F.lit(list(self.words))
        pred = F.lit(True)
        for p in _positions(key, self.m, self.n_hashes):
            word = F.get(lit_words, F.shiftright(p, 6).cast("int"))
            # SQL-level shift: the Python F.shiftright numBits must be a
            # literal int, but the SQL function accepts a column
            bit = F.call_function(
                "shiftright", word, (p % 64).cast("int")
            ).bitwiseAND(F.lit(1).cast("long"))
            pred = pred & (bit == 1)
        return pred

    @property
    def fpp_estimate(self) -> float:
        if self.n_keys == 0:
            return 0.0
        return (
            1.0 - math.exp(-self.n_hashes * self.n_keys / self.m)
        ) ** self.n_hashes


def build_bloom(
    keys: DataFrame,
    key_col: str,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    n_hashes: int = DEFAULT_N_HASHES,
    max_bits: int = MAX_BITS_DEFAULT,
) -> BloomFilter | None:
    """Build a BloomFilter over the (assumed distinct) `key_col` values
    of `keys`. Returns None — with a loud warning, never silently —
    when the key count needs more than `max_bits` bits at the requested
    density; callers treat None as "skip the prefilter" (pure perf
    fallback, semantics unchanged).

    Two jobs: a count, then the explode + bit_or aggregation whose
    result (<= m/64 rows of (word_index, bits)) is collected.
    """
    n = keys.count()
    m = 64
    while m < n * bits_per_key:
        m <<= 1
        if m > max_bits:
            warnings.warn(
                f"bloom over {n} keys needs > max_bits={max_bits} bits "
                f"at {bits_per_key} bits/key; skipping the prefilter"
            )
            return None
    key = F.col(key_col)
    rows = (
        keys.select(F.explode(F.array(*_positions(key, m, n_hashes))).alias("p"))
        .groupBy(F.shiftright("p", 6).cast("int").alias("w"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
                )
            ).alias("bits")
        )
        .collect()
    )
    words = [0] * (m // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return BloomFilter(tuple(words), m, n_hashes, n)
