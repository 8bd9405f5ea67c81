"""Property test: distributed connected components vs a union-find oracle.

``_propagate_min_labels`` is the one iterative algorithm in the engine
(min-label propagation + path halving until a fixed point); the oracle
parity suite checks it on ONE fixture graph, which cannot probe the
convergence edge cases — long chains (worst case for label hops), rings,
stars, self-contained cliques, disconnected singletons mixed in.  Here
hypothesis generates random edge lists and the result must equal a plain
Python union-find: every vertex labeled with the minimum doc_id of its
component.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _union_find_labels(vertices: set[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in vertices}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in vertices}


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@given(edge_lists)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_propagate_min_labels_equals_union_find(spark, edges):
    from open_source_etl_spark.operators.llm_dedup import _propagate_min_labels

    vertices = {v for e in edges for v in e}
    want = _union_find_labels(vertices, edges)

    e = spark.createDataFrame(edges, "src long, dst long")
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # same fused initialization the operator uses: round 1 = grouped min
    # of least(src, dst) over the undirected edge list
    labels = (
        und.select(F.col("src").alias("doc_id"), F.least("src", "dst").alias("label"))
        .groupBy("doc_id")
        .agg(F.min("label").alias("label"))
    )
    got = {
        r.doc_id: r.label
        for r in _propagate_min_labels(und, labels).collect()
    }
    assert got == want
