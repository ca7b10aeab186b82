"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — the exact baseline: one broadcast of the
    query set, JVM-side dot products (`zip_with`/`aggregate` column
    expressions — zero Python), per-query top-k via window.
  * LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures
    bucket vectors; queries probe only their bucket (and optionally
    neighboring single-bit-flip buckets).

Determinism: hyperplanes are derived from a seed via numpy and shipped
as literal arrays into the plan, so plans are reproducible across
cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    score_decimals: int = 6,
) -> DataFrame:
    """For each query row, the k nearest `vectors` rows by cosine.
    Output: (query_id, neighbor_id, score) ordered deterministically.
    The query side is broadcast — corpus side streams, no shuffle until
    the tiny top-k window."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv")
    )
    scored = v.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        cosine(
            F.col("_qv").cast("array<double>"), F.col("_vv").cast("array<double>")
        ).alias("_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("_score", score_decimals).alias("score"),
            F.col("_rn").alias("rank"),
        )
    )


def hyperplane_signature(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
):
    """Column expression: n_planes-bit random-hyperplane LSH signature."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig = F.lit(0)
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col).cast("array<double>"), plane) > 0).cast("int")
        sig = sig + F.shiftleft(bit, i)
    return sig


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets
    (plus `multiprobe` single-bit-flip probes of the query signature).
    At scale the corpus is pre-bucketed (partitioned by signature) and
    each query touches a few buckets instead of the full corpus."""
    vsig = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vv"),
        hyperplane_signature(vectors, vec_col, dim, n_planes, seed).alias("_sig"),
    )
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        hyperplane_signature(queries, vec_col, dim, n_planes, seed).alias("_qsig"),
    )
    probes = [F.col("_qsig")] + [
        F.col("_qsig").bitwiseXOR(F.lit(1 << b)) for b in range(multiprobe)
    ]
    qsig = qbase.select(
        "query_id", "_qv", F.explode(F.array(*probes)).alias("_sig")
    )
    scored = vsig.join(F.broadcast(qsig), on="_sig").select(
        "query_id",
        "neighbor_id",
        cosine(
            F.col("_qv").cast("array<double>"), F.col("_vv").cast("array<double>")
        ).alias("_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("_score", 6).alias("score"),
            F.col("_rn").alias("rank"),
        )
    )
