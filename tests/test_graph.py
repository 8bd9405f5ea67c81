"""graph_pagerank differential check: the distributed Pregel-style
iteration must match a dense numpy PageRank on the identical edge set
(same damping, same round count), and rank mass must be conserved."""

from __future__ import annotations

import numpy as np
import pytest

from open_source_etl_spark.operators.graph_queries import (
    DAMPING,
    ROUNDS,
    graph_pagerank,
    trade_edges,
)

SF = "/root/testdata/sf0.01"


def test_pagerank_matches_numpy(spark):
    edges = trade_edges(spark, SF).collect()
    src = np.array([r.src for r in edges])
    dst = np.array([r.dst for r in edges])
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s in src:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(ROUNDS):
        contrib = np.zeros(n)
        np.add.at(contrib, [idx[d] for d in dst], r[[idx[s] for s in src]] / out_deg[[idx[s] for s in src]])
        r = (1 - DAMPING) / n + DAMPING * contrib
    assert abs(r.sum() - 1.0) < 1e-9, "numpy reference must conserve mass"

    got = graph_pagerank(spark, SF).collect()
    assert len(got) == 20
    want = {}
    for node, rank in zip(nodes, r):
        key = ("customer" if node % 2 == 0 else "supplier", node // 2)
        want[key] = rank
    for row in got:
        ref = want[(row.node_type, row.key)]
        assert row.rank == pytest.approx(ref, abs=5e-8), (
            f"{row.node_type} {row.key}: spark {row.rank} vs numpy {ref}"
        )
    # the spark top-20 must be the numpy top-20 (allowing order swaps
    # only between numerically-tied ranks)
    top_numpy = sorted(want.values(), reverse=True)[:20]
    top_spark = sorted((row.rank for row in got), reverse=True)
    assert np.allclose(top_spark, top_numpy, atol=5e-8)
