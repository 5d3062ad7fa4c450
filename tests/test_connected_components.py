"""connected_components vs a driver-side union-find on random graphs.

The Spark implementation is iterative min-label propagation with
localCheckpoint lineage cuts; union-find is the trivially-correct
reference. Any divergence (missed transitive merge, premature
convergence, label drift) fails loudly.
"""

from __future__ import annotations

import random

import pytest

from sparkstreamingrealtimedatawithkafka_spark.operators.graph import (
    connected_components,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
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
    # min node per component
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 30, 20), (1, 50, 60), (2, 40, 39)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(edges)

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["label"]
        for r in connected_components(df, max_iter=50).collect()
    }
    assert got == expected


def test_cc_long_path_converges(spark):
    """A pure path graph is the worst case for label propagation
    (diameter = n-1): a 25-node path must still fully converge — every
    node ends with label 0 — within max_iter."""
    edges = [(i, i + 1) for i in range(24)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["label"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(25)}
