"""Graph operators: triangle counting vs a brute-force reference on
crafted shapes (hub, disconnected components, triangle-free path)."""

from __future__ import annotations

import itertools
import random

from introduction_in_big_data_spark.operators.graph import triangle_count


def _brute(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    tri = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri += 1
    return tri


def _run(spark, edges):
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    row = triangle_count(df).first()
    assert row.n_edges == len(edges)
    return row.n_triangles


def test_triangle_count_crafted_shapes(spark):
    # K4 (4 triangles), a hub star (0 triangles), a path (0), plus a
    # disconnected K3 — union counts add
    k4 = {(a, b) for a, b in itertools.combinations(range(4), 2)}
    assert _run(spark, k4) == 4
    star = {(0, i) for i in range(1, 8)}
    assert _run(spark, star) == 0
    path = {(i, i + 1) for i in range(10, 16)}
    assert _run(spark, path) == 0
    mixed = k4 | {(100, 101), (101, 102), (100, 102)} | path
    assert _run(spark, mixed) == 4 + 1


def test_triangle_count_random_graph_matches_bruteforce(spark):
    rng = random.Random(7)
    nodes = list(range(18))
    edges = {
        (min(u, v), max(u, v))
        for u, v in (rng.sample(nodes, 2) for _ in range(60))
    }
    assert _run(spark, edges) == _brute(edges)
