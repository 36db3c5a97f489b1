"""PageRank invariants + NumPy dense power-iteration oracle at sf0.001."""

from __future__ import annotations

import numpy as np

from retail_sales_project_bigdata_spark.operators.graph import (
    DAMPING,
    N_ITERATIONS,
    copurchase_edges,
    pagerank_copurchase,
)
from tests.conftest import SF_SMALL


def _numpy_pagerank(edges: list[tuple[int, int]]) -> dict[int, float]:
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    rank = np.ones(n)
    for _ in range(N_ITERATIONS):
        incoming = np.zeros(n)
        for s, d in edges:
            incoming[idx[d]] += rank[idx[s]] / deg[idx[s]]
        rank = (1.0 - DAMPING) + DAMPING * incoming
    return {node: rank[idx[node]] for node in nodes}


def test_pagerank_matches_dense_oracle_and_conserves_mass(spark):
    edges = [
        (int(r.src), int(r.dst))
        for r in copurchase_edges(spark, SF_SMALL).collect()
    ]
    expected = _numpy_pagerank(edges)

    top = pagerank_copurchase(spark, SF_SMALL).collect()
    assert len(top) == min(50, len(expected))
    assert all(r.rank > 0 for r in top)
    for r in top:
        assert abs(r.rank - expected[int(r.node)]) < 1e-9

    # the returned top-k really is the global top-k (same tie-break)
    ordered = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [int(r.node) for r in top] == [n for n, _ in ordered[: len(top)]]

    # mass conservation over the full ranks: sum == N (no dangling nodes)
    full_sum = sum(expected.values())
    assert abs(full_sum - len(expected)) < 1e-6 * len(expected)
