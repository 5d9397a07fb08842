"""Connected-components (large-star/small-star) vs a union-find reference."""

from __future__ import annotations

import random

import pytest

from chessmate_spark.operators.graph import connected_components, dup_clusters


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    expected = _uf_components(edges)
    # both routes: the size-guarded driver union-find (default at this
    # scale) and the distributed star rounds (driver_edge_limit=0)
    for limit in (200_000, 0):
        got = {
            r["node"]: r["component_id"]
            for r in connected_components(
                df, driver_edge_limit=limit
            ).collect()
        }
        assert got == expected, f"route driver_edge_limit={limit}"


def test_two_triangles_and_isolated_pair(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)])


def test_long_chain_needs_multiple_rounds(spark):
    # a 60-node path has diameter 59: label propagation would need ~59
    # rounds, star contraction must finish in O(log n)
    _check(spark, [(i, i + 1) for i in range(60)])


def test_reversed_chain_and_duplicates(spark):
    edges = [(i + 1, i) for i in range(30)] + [(5, 4), (4, 5), (29, 28)]
    _check(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(70)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dup_clusters_canonical_flags(spark):
    df = spark.createDataFrame([(3, 1), (1, 2), (9, 8)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in dup_clusters(df).collect()}
    assert rows[1]["component_id"] == 1 and rows[1]["is_canonical"]
    assert rows[2]["component_id"] == 1 and not rows[2]["is_canonical"]
    assert rows[3]["cluster_size"] == 3
    assert rows[8]["is_canonical"] and rows[9]["component_id"] == 8
    assert rows[8]["cluster_size"] == 2


def test_self_loop_only_nodes_become_singletons(spark):
    """A node appearing only in (x, x) pairs must surface as its own
    singleton component, not vanish (ADVICE round-4)."""
    df = spark.createDataFrame(
        [(1, 2), (7, 7), (2, 3)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7}


def test_self_loop_singleton_is_canonical_cluster_of_one(spark):
    df = spark.createDataFrame([(5, 5), (1, 2)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in dup_clusters(df).collect()}
    assert rows[5]["cluster_size"] == 1 and rows[5]["is_canonical"]
    assert rows[1]["cluster_size"] == 2


def test_pagerank_matches_numpy_power_iteration(spark):
    """Pin the distributed PageRank against a dense numpy reference on a
    small undirected graph (triangle + tail + separate pair)."""
    import numpy as np

    from chessmate_spark.operators.graph import pagerank

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - 0.85) / n + 0.85 * (adj.T @ (r / deg))
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, (v, got[v], r[idx[v]])
    # triangle hub (node 3, degree 3) outranks everything
    assert got[3] == max(got.values())


def test_pagerank_empty_edges(spark):
    from chessmate_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank(df).count() == 0


def test_driver_and_distributed_routes_identical(spark):
    """Round-14: the size-guarded driver union-find route must be
    row-identical to the star rounds on graphs with self-loops,
    duplicate edges, reversed orientation and string ids."""
    rng = random.Random(99)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    edges += [(7, 7), (39, 39)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = sorted(
        (r["node"], r["component_id"])
        for r in connected_components(df).collect()
    )
    slow = sorted(
        (r["node"], r["component_id"])
        for r in connected_components(df, driver_edge_limit=0).collect()
    )
    assert fast == slow

    sdf = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "x"), ("q", "z")],
        "id_a string, id_b string",
    )
    fast_s = sorted(
        (r["node"], r["component_id"])
        for r in connected_components(sdf).collect()
    )
    slow_s = sorted(
        (r["node"], r["component_id"])
        for r in connected_components(sdf, driver_edge_limit=0).collect()
    )
    assert fast_s == slow_s == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("q", "q"), ("x", "x"),
        ("z", "q"),
    ]


def test_pagerank_driver_and_distributed_routes_identical(spark):
    """Round-14: the size-guarded driver power-iteration route must match
    the distributed rounds at the entries' 8-digit rounding (d11's
    contract) on graphs with self-loops and duplicate/reversed edges."""
    import math

    from chessmate_spark.operators.graph import pagerank

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(45)]
    edges += [(4, 4), (2, 1)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {
        r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()
    }
    slow = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=10, driver_edge_limit=0).collect()
    }
    assert set(fast) == set(slow)
    for v in fast:
        f8 = math.floor(fast[v] * 1e8 + 0.5) / 1e8
        s8 = math.floor(slow[v] * 1e8 + 0.5) / 1e8
        assert f8 == s8, (v, fast[v], slow[v])
    # both routes conserve total rank mass
    assert abs(sum(fast.values()) - 1.0) < 1e-9


def test_null_endpoint_pairs_dropped_on_both_routes(spark):
    """Round-14 ADVICE: a null id in the pair list must not crash the
    driver union-find / power-iteration routes (Python sorted() cannot
    order None against ids).  Both routes now drop null-endpoint pairs
    wholesale before solving — identical, documented dirty-input
    semantics."""
    from pyspark.sql.types import (
        LongType, StructField, StructType,
    )

    from chessmate_spark.operators.graph import pagerank

    schema = StructType(
        [
            StructField("id_a", LongType(), True),
            StructField("id_b", LongType(), True),
        ]
    )
    rows = [(1, 2), (2, 3), (None, 4), (5, None), (None, None), (7, 7)]
    df = spark.createDataFrame(rows, schema)
    clean = [(a, b) for a, b in rows if a is not None and b is not None]
    expected = _uf_components(clean)
    for limit in (200_000, 0):
        got = {
            r["node"]: r["component_id"]
            for r in connected_components(
                df, driver_edge_limit=limit
            ).collect()
        }
        assert got == expected, f"route driver_edge_limit={limit}"
    ranks_driver = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=3).collect()
    }
    ranks_dist = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=3, driver_edge_limit=0).collect()
    }
    assert set(ranks_driver) == set(ranks_dist) == {1, 2, 3, 7}
    for k in ranks_driver:
        assert abs(ranks_driver[k] - ranks_dist[k]) < 1e-9
