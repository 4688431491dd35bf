"""connected_components / near_dup_clusters (operators/cluster.py).

Ground truth is a driver-side union-find over the same edge list —
exact for any graph, so the tests can throw arbitrary shapes (chains,
cliques, isolates) at the distributed label propagation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.cluster import (
    connected_components,
    near_dup_clusters,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label every node with its component MIN
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _check(spark, nodes, edges, max_iter=50):
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    n = spark.createDataFrame([(x,) for x in nodes], "id long") if nodes else None
    got = {
        (r["id"], r["comp"])
        for r in connected_components(e, "src", "dst", nodes=n, max_iter=max_iter).collect()
    }
    all_nodes = set(nodes) | {x for p in edges for x in p}
    want = set(_union_find(sorted(all_nodes), edges).items())
    assert got == want


def test_two_triangles_and_isolate(spark):
    _check(
        spark,
        nodes=[99],
        edges=[(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)],
    )


def test_long_chain_converges(spark):
    # worst case for plain min-propagation: diameter = chain length
    chain = [(i, i + 1) for i in range(10)]
    _check(spark, nodes=[], edges=chain, max_iter=15)


def test_edges_only_no_extra_nodes(spark):
    _check(spark, nodes=[], edges=[(5, 3), (7, 5), (100, 200)])


def test_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert connected_components(e, "src", "dst").count() == 0


def test_non_convergence_raises(spark):
    chain = spark.createDataFrame([(i, i + 1) for i in range(10)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, "src", "dst", max_iter=2)


def test_near_dup_clusters_shape(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in near_dup_clusters(docs, pairs).collect()}
    assert rows[0]["cluster_id"] == 0 and rows[3]["cluster_id"] == 0
    assert rows[5]["cluster_id"] == 0 and rows[5]["n_members"] == 3
    assert rows[0]["is_canonical"] and not rows[3]["is_canonical"]
    for i in (1, 2, 4):  # singletons
        assert rows[i]["cluster_id"] == i and rows[i]["n_members"] == 1 and rows[i]["is_canonical"]


def test_canonical_dedup_keeps_best_per_cluster(spark):
    from parquet_rewriter_spark.operators.cluster import canonical_dedup

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0), (5, 50.0)],
        "doc_id long, quality double",
    )
    # cluster {1,2,3} (chain), singleton {4}, singleton {5}
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.doc_id: r for r in canonical_dedup(docs, pairs, "quality").collect()}
    assert set(out) == {2, 4, 5}  # best of cluster + all singletons
    assert out[2].n_dups_dropped == 2
    assert out[4].n_dups_dropped == 0 and out[5].n_dups_dropped == 0


def test_canonical_dedup_tiebreak_is_stable(spark):
    from parquet_rewriter_spark.operators.cluster import canonical_dedup

    docs = spark.createDataFrame(
        [(7, 1.0), (8, 1.0), (9, 1.0)], "doc_id long, quality double"
    )
    pairs = spark.createDataFrame([(7, 8), (8, 9)], "id_a long, id_b long")
    out = canonical_dedup(docs, pairs, "quality").collect()
    assert len(out) == 1 and out[0].doc_id == 7  # equal quality → lowest id
