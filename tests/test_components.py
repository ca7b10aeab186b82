"""Distributed connected components + near-dup clustering
(operators/components.py).

Covers: correctness vs a pure-Python union-find oracle on random
graphs, pointer-doubling convergence speed on the chain worst case,
isolated-vertex handling, edge-input hygiene (duplicates, direction,
self loops), and the canonical-keep selection rule.
"""

import random

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.operators.components import (
    canonical_docs,
    connected_components,
    near_dup_clusters,
)


def _uf_components(n_vertices, edges):
    """Union-find oracle: vertex -> min vertex id of its component."""
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in range(n_vertices)}


def _run(spark, n_vertices, edges, small_graph_edges=0):
    e = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges] or [(0, 0)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(n_vertices)], "v long")
    out = connected_components(
        e, vertices=verts, id_col="v", small_graph_edges=small_graph_edges
    )
    return {r["v"]: r["component"] for r in out.collect()}


def test_components_vs_union_find_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = 60 + trial * 25
        m = rng.randrange(10, n * 2)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        want = _uf_components(n, edges)
        # both execution paths must agree with the oracle: the
        # distributed label loop and the bounded driver union-find
        assert _run(spark, n, edges, small_graph_edges=0) == want, f"trial {trial}"
        assert _run(spark, n, edges, small_graph_edges=10_000) == want, f"trial {trial} (fast path)"


def test_components_chain_converges_fast(spark):
    # 64-vertex chain: diameter 63. Pointer doubling must collapse it in
    # O(log d) rounds — assert via the iteration ceiling, far below the
    # linear 63 rounds plain propagation would need. Force the
    # distributed path: the convergence-speed claim is about the loop.
    edges = [(i, i + 1) for i in range(63)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(e, max_iter=8, small_graph_edges=0)
    rows = {r["v"]: r["component"] for r in out.collect()}
    assert rows == {i: 0 for i in range(64)}


def test_components_edge_hygiene(spark):
    # duplicates, reversed direction, self loops — all tolerated on
    # both paths
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)]
    want = {0: 0, 1: 1, 2: 1, 3: 3, 4: 4, 5: 4}
    assert _run(spark, 6, edges, small_graph_edges=0) == want
    assert _run(spark, 6, edges, small_graph_edges=100) == want


def test_components_requires_id_col_with_vertices(spark):
    e = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    verts = spark.createDataFrame([(0,), (1,)], "v long")
    with pytest.raises(ValueError):
        connected_components(e, vertices=verts)


def test_near_dup_clusters_singletons_and_groups(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta epsilon"),   # exact dup of 0
            (2, "alpha beta gamma delta zeta"),      # 4/6 jaccard vs 0 — below 0.8
            (3, "completely different words here now"),
        ],
        "doc_id long, text string",
    )
    out = near_dup_clusters(docs, "doc_id", "text", threshold=0.8)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 3}


def test_canonical_docs_prefers_longest_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [(0, 10), (1, 25), (2, 25), (3, 7)],
        "doc_id long, n_chars long",
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "doc_id long, cluster_id long"
    )
    kept = canonical_docs(docs, clusters, "doc_id", "n_chars")
    rows = {r["cluster_id"]: (r["doc_id"], r["n_docs"]) for r in kept.collect()}
    # cluster 0: docs 1 and 2 tie on n_chars=25 -> smaller id 1 wins
    assert rows == {0: (1, 3), 3: (3, 1)}


def test_components_no_vertex_collects(spark):
    """On the distributed path the only driver actions are the per-round
    single-row convergence probes — the vertex/edge sets themselves are
    never collected. Guard by running a graph larger than any plausible
    collect default and checking the result row count lazily."""
    n = 5000
    edges = [(i, i + 1) for i in range(0, n - 1, 2)]  # 2500 pairs
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(e, small_graph_edges=0)
    assert out.groupBy().agg(F.count(F.lit(1))).first()[0] == n
    assert out.filter(F.col("component") % 2 != 0).count() == 0


def test_components_over_cap_uses_distributed_path(spark):
    """A graph over the small-graph cap must still resolve (the fast
    path silently hands over to the label loop)."""
    n = 600
    edges = [(i, i + 1) for i in range(n - 1)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    # symmetrized edge count = 2*(n-1) > cap=1000 -> distributed loop
    out = connected_components(e, small_graph_edges=1000)
    rows = {r["v"]: r["component"] for r in out.collect()}
    assert rows == {i: 0 for i in range(n)}
