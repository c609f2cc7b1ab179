"""Connected components vs a union-find oracle, including invariance
under edge order and partitioning (SURVEY §5.6)."""

from __future__ import annotations

import random

from datamatcher_spark.plans.clustering import cluster_assignments, connected_components


def union_find(nodes, edges):
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
    # root every component at its minimum id
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, nodes, edges):
    e = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    if not edges:
        e = e.limit(0)
    cc, iters = connected_components(e)
    got = {r.node: r.component for r in cc.collect()}
    oracle = union_find(nodes, edges)
    expected = {n: c for n, c in oracle.items() if any(n in p for p in edges)}
    assert got == expected, f"iters={iters}"


def test_cc_simple_chain(spark):
    nodes = list("abcdef")
    edges = [("a", "b"), ("b", "c"), ("d", "e")]
    _check(spark, nodes, edges)


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        nodes = [f"n{i:03d}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(20, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, nodes, edges)


def test_cc_edge_order_invariance(spark):
    nodes = [f"n{i}" for i in range(20)]
    edges = [(f"n{i}", f"n{i+1}") for i in range(19)]  # one long chain
    e1 = spark.createDataFrame(edges, "src string, dst string")
    e2 = spark.createDataFrame(list(reversed([(b, a) for a, b in edges])),
                               "src string, dst string").repartition(7)
    cc1, _ = connected_components(e1)
    cc2, _ = connected_components(e2)
    assert {tuple(r) for r in cc1.collect()} == {tuple(r) for r in cc2.collect()}


def test_singletons_assigned_to_self(spark):
    urls = spark.createDataFrame([("u1",), ("u2",), ("u3",)], "url string")
    edges = spark.createDataFrame([("u1", "u2")], "url_a string, url_b string")
    assign, _ = cluster_assignments(urls, edges)
    got = {r.url: r.cluster_id for r in assign.collect()}
    assert got == {"u1": "u1", "u2": "u1", "u3": "u3"}
