"""Distributed connected components + near-duplicate clustering.

Completes the corpus-dedup story: pairwise near-dup EDGES (from
MinHash / SimHash / embedding LSH — operators/dedup.py,
operators/similarity.py) -> duplicate CLUSTERS -> one canonical kept
document per cluster. The reference's dedup is key-based only
(EXCEPT / row_number — datalake main.py K6/K7); grouping transitive
near-duplicates is the layer a training-data curation pipeline needs
on top, so it is built here as a first-class operator.

Algorithm: iterative min-label propagation with POINTER DOUBLING —
each round every vertex takes the minimum label over {itself, its
neighbours}, then short-circuits via label <- label(label). This is
the DataFrame rendering of the classic MapReduce CC family (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14);
the doubling step collapses chains geometrically, so convergence is
O(log d) rounds for graph diameter d (a 64-chain converges in 4
rounds — asserted in tests/test_components.py).

Scale shape per round: two hash-shuffle joins keyed on the vertex id
plus one groupBy — no driver-side graph state, no collect of vertices
or edges, so the identical plan runs on a 1000-executor cluster.
Lineage is truncated per round with localCheckpoint (the standard
iterative-algorithm pattern — without it the plan tree doubles every
round). The ONLY driver action per round is a single-row convergence
probe: min-labels are monotonically non-increasing, so the label sum
strictly decreases until the fixpoint; we stop when it stops moving
(sum computed in decimal(38,0) — overflow-proof at any vertex count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .dedup import minhash_near_dup_pairs

# Iteration ceiling: pointer doubling needs ~log2(diameter) rounds, so
# 50 covers any graph a dedup workload can produce (diameter < 2^50).
# Hitting it means the convergence probe is broken, not the graph big.
MAX_CC_ITERATIONS = 50


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    vertices: DataFrame | None = None,
    id_col: str | None = None,
    max_iter: int = MAX_CC_ITERATIONS,
) -> DataFrame:
    """(vertex_id, component) for every vertex, where `component` is the
    minimum vertex id in the connected component (a deterministic,
    engine-portable cluster id — no Spark-specific hashing involved).

    `edges` is an undirected pair list; direction, duplicates and self
    loops are all tolerated. Pass `vertices` (+ `id_col`) to include
    isolated vertices — e.g. documents with no near-dup pair — each of
    which comes back as its own singleton component.
    """
    e = edges.select(F.col(src).alias("es"), F.col(dst).alias("ed"))
    e = (
        e.union(e.select(F.col("ed").alias("es"), F.col("es").alias("ed")))
        .where(F.col("es") != F.col("ed"))
        .distinct()
    )

    verts = e.select(F.col("es").alias("v"))
    if vertices is not None:
        if id_col is None:
            raise ValueError("vertices requires id_col")
        verts = verts.union(vertices.select(F.col(id_col).alias("v")))
    verts = verts.distinct()

    labels = verts.select("v", F.col("v").alias("label")).localCheckpoint()
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).first()["s"]

    for _ in range(max_iter):
        # 1) neighbour-min: every edge endpoint offers its label across
        #    the edge; vertex takes min(own, offers). Left join keeps
        #    isolated vertices.
        offers = (
            e.join(labels.withColumnRenamed("v", "es"), "es")
            .groupBy(F.col("ed").alias("v"))
            .agg(F.min("label").alias("nbr"))
        )
        stepped = labels.join(offers, "v", "left").select(
            "v",
            F.least(F.col("label"), F.coalesce("nbr", "label")).alias("label"),
        )
        # 2) pointer doubling: label <- label(label) collapses chains
        #    geometrically (the min label propagates 2^k hops in k rounds).
        parent = stepped.select(
            F.col("v").alias("pv"), F.col("label").alias("plabel")
        )
        labels = (
            stepped.join(parent, stepped["label"] == parent["pv"], "left")
            .select(
                stepped["v"],
                F.least(
                    stepped["label"], F.coalesce(parent["plabel"], stepped["label"])
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur_sum == prev_sum:
            return labels.select(F.col("v"), F.col("label").alias("component"))
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pointer doubling bounds rounds by ~log2(diameter); this "
        "indicates a harness bug, not a large graph"
    )


def near_dup_clusters(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_perm: int = 16,
    bands: int = 16,
    k: int = 1,
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: MinHash-LSH verified
    near-dup pairs -> transitive closure. Documents with no near-dup
    are singleton clusters (cluster_id = own id); cluster_id is the
    minimum doc id in the group, so the output is engine-portable and
    driver-checkable against an exact recursive-CTE oracle."""
    pairs = minhash_near_dup_pairs(
        docs, id_col, text_col, threshold=threshold, n_perm=n_perm, bands=bands, k=k
    )
    cc = connected_components(
        pairs, "id_a", "id_b", vertices=docs, id_col=id_col
    )
    return cc.select(F.col("v").alias(id_col), F.col("component").alias("cluster_id"))


def canonical_docs(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    prefer_col: str,
) -> DataFrame:
    """One kept row per cluster: highest `prefer_col`, ties broken by
    smallest id (deterministic). Output: cluster_id, n_docs, kept doc
    columns — the keep-list a curation pipeline joins back against the
    corpus (single window shuffle on cluster_id; the wide doc columns
    ride through exactly once)."""
    joined = docs.join(clusters, id_col)
    w = W.partitionBy("cluster_id").orderBy(
        F.col(prefer_col).desc(), F.col(id_col).asc()
    )
    counted = W.partitionBy("cluster_id")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(counted))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
