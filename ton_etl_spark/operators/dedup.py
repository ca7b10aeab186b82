"""Deduplication operators for large-scale corpus curation.

Beyond the reference's key-based dedup (EXCEPT / row_number — K6/K7),
a training-data pipeline needs content dedup at document granularity:

  * exact            — sha256 grouping (JVM-side, zero Python)
  * near-dup MinHash — shingle -> minhash signature -> LSH band join
  * SimHash          — 64-bit locality-sensitive fingerprint
  * n-gram Jaccard   — exact set similarity for candidate verification

Scale design: everything is expressed as explode/groupBy/join pipelines
whose shuffles are on (doc, band) or (band_hash) keys — the classic
LSH-bucketing layout that survives 100 TB corpora. The only Python is
the SimHash bit-packing pandas UDF; MinHash uses xxhash64 (JVM) for all
hashing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: (content_sha, n_docs, doc_ids)."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def _tokens(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Word k-shingles per document (distinct), via JVM array functions."""
    toks = _tokens(text_col)
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return df.select(F.col(id_col), F.array_distinct(sh).alias("shingles"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_perm: int = 16, k: int = 3
) -> DataFrame:
    """id -> array<long> minhash signature. Permutation i is
    min(xxhash64(i, shingle)) — deterministic, JVM-vectorized."""
    sh = shingles(df, id_col, text_col, k)
    exploded = sh.select(id_col, F.explode("shingles").alias("_s"))
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("_s"))).alias(f"_h{i}")
            for i in range(n_perm)
        ]
    )
    return mins.select(
        id_col, F.array(*[f"_h{i}" for i in range(n_perm)]).alias("signature")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH: docs agreeing on any band are candidate near-dups.
    Shuffle key is (band_idx, band_hash) — bounded buckets, no O(n^2)."""
    rows_per_band = n_perm // bands
    sig = minhash_signatures(df, id_col, text_col, n_perm, k)
    banded = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ":",
                            F.transform(
                                F.slice(
                                    F.col("signature"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.band_hash")
    a, bb = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            bb,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.0,
    k: int = 1,
) -> DataFrame:
    """Exact word-k-gram Jaccard over all pairs (verification / small-N
    path; pair with lsh_candidate_pairs for the 100 TB path)."""
    sh = shingles(df, id_col, text_col, k)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    return (
        a.crossJoin(b)
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


_SIMHASH_SCHEMA = T.LongType()


@F.pandas_udf(_SIMHASH_SCHEMA)
def _simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token lists (Arrow-batched; the bit-voting
    loop is numpy-vectorized per document)."""

    import hashlib

    def h64(t: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
        )

    def one(tok):
        if tok is None or len(tok) == 0:
            return 0
        hs = np.array([np.uint64(h64(t)) for t in tok], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out - (1 << 64) if out >= (1 << 63) else out)

    return tokens.map(one)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """id -> 64-bit simhash (as signed long); token hashing is blake2b,
    deterministic across runs and parallelism levels."""
    return df.select(
        F.col(id_col), _simhash64(_tokens(text_col)).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, bucketed by bit
    prefix (scale path: candidates only meet inside a prefix bucket)."""
    s = simhash(df, id_col, text_col)
    bucketed = s.withColumn(
        "_bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, on=[F.col("a._bucket") == F.col("b._bucket"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
