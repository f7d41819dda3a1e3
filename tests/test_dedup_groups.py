"""Property tests for the distributed connected-components dedup stage.

`connected_components` (alternating large-star/small-star,
searchengine_spark/ml/dedup.py) is checked against a plain union-find
oracle on seeded random graphs, plus the adversarial shapes for this
algorithm family: long chains (label propagation's worst case — must
still converge in O(log n) star rounds, enforced by a tight max_rounds),
duplicate/reversed/self-loop edges, and the empty graph.
"""

from __future__ import annotations

import random

from pyspark.sql import types as T


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find oracle: node -> min node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_spark(
    spark,
    edges: list[tuple[int, int]],
    max_rounds: int = 50,
    driver_max_edges: int = 1_000_000,
):
    from searchengine_spark.ml.dedup import connected_components

    schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
        ]
    )
    df = spark.createDataFrame(edges or [], schema=schema)
    out = connected_components(
        df, max_rounds=max_rounds, driver_max_edges=driver_max_edges
    )
    return {r["node"]: r["component"] for r in out.collect()}


def test_random_graphs_match_union_find_both_paths(spark):
    # driver_max_edges=0 forces the distributed star rounds; the default
    # takes the driver union-find fast path — both must agree with the
    # in-test union-find oracle on the same seeded graphs
    rng = random.Random(20260817)
    for trial in range(3):
        n = 60 + 30 * trial
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(n // 2)  # sparse: many components, some self-loops
        ]
        want = _uf_components(edges)
        assert _cc_spark(spark, edges, driver_max_edges=0) == want, edges
        assert _cc_spark(spark, edges) == want, edges


def test_chain_converges_in_log_rounds(spark):
    # a 33-node chain has diameter 32; label propagation would need 32
    # rounds, large-star/small-star must finish in O(log n) — 8 is ample
    # for n=33 and far below the diameter, so passing proves the
    # algorithm is the star-contraction one, not label propagation.
    # driver_max_edges=0: the chain must exercise the DISTRIBUTED rounds.
    chain = [(i, i + 1) for i in range(32)]
    got = _cc_spark(spark, chain, max_rounds=8, driver_max_edges=0)
    assert got == {i: 0 for i in range(33)}


def test_dirty_edges_and_empty(spark):
    # duplicates, reversed duplicates, self-loops — on both paths
    edges = [(5, 9), (9, 5), (5, 9), (7, 7), (1, 2), (2, 3)]
    assert _cc_spark(spark, edges) == _uf_components(edges)
    assert _cc_spark(spark, edges, driver_max_edges=0) == _uf_components(edges)
    assert _cc_spark(spark, []) == {}
    assert _cc_spark(spark, [], driver_max_edges=0) == {}
