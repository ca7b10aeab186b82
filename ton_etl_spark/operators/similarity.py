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


def _plane_dots(vec_col: str, dim: int, n_planes: int, seed: int):
    """array<double> of the vector's dot product with each seeded
    hyperplane. The planes ship as ONE nested-array literal walked with
    higher-order functions — the earlier per-element `F.lit` spelling
    put n_planes*dim scalar literal nodes in the plan, and at
    12 bands x 4 planes x 64 dims the plan build + codegen alone cost
    ~7 s per query; a single matrix literal is one tree node."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).tolist()
    v = F.col(vec_col).cast("array<double>")
    return F.transform(F.lit(planes), lambda p: _dot(v, p))


def _signature_of(dots, n_planes: int):
    """Fold a plane-dots array into the n_planes-bit signature in one
    pass (zip with bit weights, sum) — the per-bit element_at spelling
    re-evaluated the whole dot transform once per bit. Single source of
    the bit encoding: `signature_probes` MUST bucket with the identical
    fold or multiprobe recall silently breaks."""
    weights = [float(1 << i) for i in range(n_planes)]
    return F.aggregate(
        F.zip_with(
            dots,
            F.lit(weights),
            lambda d, w: F.when(d > 0, w).otherwise(0.0),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    ).cast("int")


def hyperplane_signature(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
):
    """Column expression: n_planes-bit random-hyperplane LSH signature
    (df is unused — kept for call-site symmetry with the operators)."""
    return _signature_of(_plane_dots(vec_col, dim, n_planes, seed), n_planes)


def signature_probes(
    vec_col: str,
    dim: int,
    n_planes: int,
    seed: int,
    multiprobe: int,
):
    """array of bucket signatures to probe: the exact signature plus
    `multiprobe` single-bit flips of the LEAST-CONFIDENT bits — the
    planes with the smallest |dot| margin, where the neighbor most
    plausibly lies on the other side (classic multi-probe LSH). All
    column expressions; margins are computed from the same literal
    planes as the signature."""
    dots = _plane_dots(vec_col, dim, n_planes, seed)
    sig = _signature_of(dots, n_planes)
    ranked = F.array_sort(
        F.zip_with(
            dots,
            F.lit(list(range(n_planes))),
            lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("i")),
        )
    )
    probes = [sig]
    for k in range(min(multiprobe, n_planes)):
        flip_bit = F.element_at(ranked, k + 1).getField("i")
        # shiftleft needs a literal shift amount -> 2^bit via pow
        mask = F.pow(F.lit(2.0), flip_bit).cast("int")
        probes.append(sig.bitwiseXOR(mask))
    return F.array(*probes)


def _ivf_assign_udf(centroids: list[list[float]]):
    """Arrow kernel: 1-based index of the nearest centroid by dot
    product, computed as one numpy argmax-matmul per batch. Dense
    linear algebra does NOT belong in Catalyst higher-order functions
    (they are interpreted — no codegen — so a literal-centroid
    `transform`/`aggregate` chain costs ~µs per lambda eval, which is
    per row x per cell x per dim); an Arrow batch matmul is the same
    deterministic arithmetic at memory bandwidth. Same tradeoff as
    `_band_signature_udf` above."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (n_cells, dim)

    def assign(vs):
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        zero = np.zeros(C.shape[1])
        m = np.stack(
            [np.asarray(x, dtype=np.float64) if x is not None else zero for x in vs]
        )
        return pd.Series((m @ C.T).argmax(axis=1).astype("int32") + 1)

    assign.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "int")


def _ivf_probe_udf(centroids: list[list[float]], nprobe: int):
    """Arrow kernel: array<int> of the (1-based) `nprobe` nearest
    centroid indices for each query vector — the cells it searches."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    p = min(nprobe, C.shape[0])

    def probes(vs):
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        zero = np.zeros(C.shape[1])
        m = np.stack(
            [np.asarray(x, dtype=np.float64) if x is not None else zero for x in vs]
        )
        # stable top-p by descending dot (ties -> lower cell id first)
        order = np.argsort(-(m @ C.T), axis=1, kind="stable")[:, :p]
        return pd.Series([[int(c) + 1 for c in row] for row in order])

    probes.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(probes, "array<int>")


def train_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 2,
    max_sample: int = 65536,
) -> list[list[float]]:
    """Deterministic coarse quantizer: collect the `max_sample`
    lowest-id vectors (ONE bounded Spark job), seed cells with the
    first `n_cells` of them, then run `iters` Lloyd steps in numpy on
    the driver. Training an IVF quantizer on a bounded sample is the
    standard build recipe (the cell structure needs the distribution,
    not every row); the full corpus is only ever touched by the
    assignment kernel at search/index time. Deterministic given the
    data: the sample is an id-ordered prefix, no RNG."""
    rows = (
        df.orderBy(id_col)
        .limit(max_sample)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    m = np.asarray([r["v"] for r in rows], dtype=np.float64)  # (n, dim)
    C = m[:n_cells].copy()
    for _ in range(iters):
        cell = (m @ C.T).argmax(axis=1)
        for c in range(C.shape[0]):
            members = m[cell == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in C]


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their
    nearest coarse centroid; each query searches only its `nprobe`
    nearest cells, exactly (same cosine as the brute-force kernel).

    Scale shape: the corpus is partitioned by `_cell` (at rest:
    `.write.bucketBy(n_cells, "_cell")` — the assignment kernel is
    deterministic so the bucketing survives re-reads), queries
    broadcast with their probe lists exploded, and the join fans each
    query out to nprobe/n_cells of the data instead of all of it.
    Cell assignment/probing are Arrow argmax-matmul kernels (see
    `_ivf_assign_udf` for why not literal-centroid HOF expressions)."""
    vcell = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vv"),
        _ivf_assign_udf(centroids)(F.col(vec_col)).alias("_cell"),
    )
    qprobe = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            _ivf_probe_udf(centroids, nprobe)(F.col(vec_col))
        ).alias("_cell"),
    )
    scored = vcell.join(F.broadcast(qprobe), on="_cell").select(
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


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    score_decimals: int = 6,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a, id_b, score)
    with id_a < id_b and round(cosine, score_decimals) >= threshold.

    This is the VERIFIER kernel — O(n^2) comparisons, so it is only run
    directly on bounded subsets (or within LSH candidate buckets; see
    `cosine_near_dup_lsh` for the 100 TB path). Mirrors the role
    n-gram Jaccard plays for text dedup."""
    v = F.col(vec_col).cast("array<double>")
    a = df.select(F.col(id_col).alias("id_a"), v.alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), v.alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine(F.col("_va"), F.col("_vb")), score_decimals
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def _band_signature_udf(dim: int, n_bands: int, band_planes: int, seed: int):
    """Arrow-vectorized banded-signature kernel: sig[b] of a vector v
    packs the sign bits of v . plane_i for the planes of band b
    (plane i belongs to band i // band_planes with bit weight
    1 << (i % band_planes)). Deterministic: the plane matrix is
    derived from `seed` exactly like `_plane_dots`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    n_total = n_bands * band_planes
    planes = rng.standard_normal((n_total, dim))
    weights = (1 << (np.arange(n_total) % band_planes)).astype(np.int64)
    band_of = np.arange(n_total) // band_planes

    def band_sigs(vs):
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        zero = np.zeros(dim)
        m = np.stack(
            [
                np.asarray(x, dtype=np.float64) if x is not None else zero
                for x in vs
            ]
        )
        contrib = (m @ planes.T > 0) * weights          # (N, n_total)
        out = np.zeros((len(vs), n_bands), dtype=np.int64)
        for b in range(n_bands):
            out[:, b] = contrib[:, band_of == b].sum(axis=1)
        return pd.Series([[int(x) for x in row] for row in out])

    # real type objects, not strings: `from __future__ import
    # annotations` would stringify inline hints and break inference
    band_sigs.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(band_sigs, "array<int>")


def cosine_near_dup_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bands: int = 16,
    band_planes: int = 8,
    seed: int = 42,
    score_decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup at scale: banded random-hyperplane LSH
    (OR over `n_bands` independent `band_planes`-bit signatures) buckets
    the corpus; candidate pairs share a (band, signature) bucket and are
    then EXACTLY verified with the same cosine as the brute-force kernel
    — so precision is exact and only recall is probabilistic (miss prob
    per true pair (1 - p^band_planes)^n_bands with p = 1 - theta/pi;
    a pair at cos 0.99 under the 16x8 default misses with p ~ 1e-8.
    Band WIDTH controls candidate volume: 8-plane bands give 256
    buckets per band, so bucket joins stay sparse as the corpus grows
    (4-plane bands degenerate toward all-pairs past ~1k vectors).

    Scale shape: one shuffle on bounded (band, signature) keys — no
    all-pairs product; each vector appears in exactly n_bands buckets."""
    # ALL band signatures from one Arrow-vectorized kernel: a batch
    # matmul against the (n_bands*band_planes, dim) plane matrix plus a
    # per-band bit fold, in numpy. This is the ONE place the similarity
    # stack leaves the JVM, and deliberately so: Catalyst higher-order
    # functions run interpreted (no whole-stage codegen), so every
    # column-expression spelling of a 128-plane signature measured
    # seconds per thousand rows (per-band trees: ~0.4 s of ANALYSIS per
    # band; slice-per-band: re-evaluates the dot transform once per
    # band per row; an aggregate fold: rebuilds the accumulator array
    # per element) — while one BLAS matmul per Arrow batch is
    # microseconds and scales linearly. Same planes, same sign test,
    # bit-identical signatures (asserted by the exact-vs-LSH test).
    v = F.col(vec_col).cast("array<double>")
    sig_udf = _band_signature_udf(dim, n_bands, band_planes, seed)
    # the banded frame carries ONLY (id, band, sig): shuffling vectors
    # through the candidate join + pair dedup would double the shuffle
    # bytes for nothing — vectors are re-attached to the (typically
    # tiny) surviving pair set for verification
    pre = df.select(F.col(id_col).alias("_id"), sig_udf(v).alias("_sigs"))
    banded = pre.select("_id", F.posexplode("_sigs").alias("band", "sig"))
    cand = (
        banded.select(F.col("_id").alias("id_a"), "band", "sig")
        .join(
            banded.select(F.col("_id").alias("id_b"), "band", "sig"),
            on=["band", "sig"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        # a pair can collide in several bands — verify it once
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b")
    )
    va = df.select(F.col(id_col).alias("id_a"), v.alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), v.alias("_vb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine(F.col("_va"), F.col("_vb")), score_decimals
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


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
    qsig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            signature_probes(vec_col, dim, n_planes, seed, multiprobe)
        ).alias("_sig"),
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


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    score_decimals: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each cluster, a
    row is DROPPED iff a lower-id row of the same cluster has
    round(cosine, score_decimals) >= threshold — i.e. the smallest-id
    member of every semantic-duplicate group is the canonical keeper.
    The keep rule is non-recursive (existence of ANY lower-id near
    neighbor, kept or not), which makes it order-free, deterministic
    at any parallelism, and expressible in one ANSI-SQL EXISTS for the
    oracle. Clusters come from any partitioner — kmeans/IVF centroids
    (`train_centroids` + `_ivf_assign_udf`) at scale, or a label
    column in tests.

    Output: (id, cluster, is_kept) for every input row.

    Scale shape: the quadratic comparison runs ONLY within a cluster
    (the whole point of SemDeDup — cluster first so n^2 is per-cell,
    not corpus-wide); one shuffle on the cluster key for the self-join.
    The dropped-id set joins back WITHOUT a forced broadcast: its size
    is the duplicate count — potentially a large fraction of the
    corpus — so the join strategy is left to the optimizer/AQE (which
    broadcasts when the runtime size allows, shuffles when it
    doesn't). No Python."""
    v = F.col(vec_col).cast("array<double>")
    a = df.select(
        F.col(id_col).alias("_ida"),
        F.col(cluster_col).alias("_cl"),
        v.alias("_va"),
    )
    b = df.select(
        F.col(id_col).alias("_idb"),
        F.col(cluster_col).alias("_cl"),
        v.alias("_vb"),
    )
    dropped = (
        a.join(b, on="_cl")
        .filter(F.col("_idb") < F.col("_ida"))
        .filter(
            F.round(cosine(F.col("_va"), F.col("_vb")), score_decimals)
            >= threshold
        )
        .select(F.col("_ida").alias("_dropped_id"))
        .distinct()
    )
    return (
        df.join(
            dropped,
            F.col(id_col) == F.col("_dropped_id"),
            "left",
        )
        .select(
            F.col(id_col),
            F.col(cluster_col).alias("cluster"),
            F.col("_dropped_id").isNull().alias("is_kept"),
        )
    )
