"""Partition-count invariance: the same query at different shuffle
widths must produce IDENTICAL canonical results.

This is the empirical proof behind two claims the engine makes
everywhere: (1) the fixed-point decimal-sum discipline
(functions/parity.py) makes aggregates order-independent — a 1000-way
parallel sum on a cluster hashes the same as a 3-way local one; (2) no
query's result depends on physical layout (partition boundaries, task
order).  A query that breaks this would pass the DuckDB oracle locally
and still drift run-to-run on a real cluster.

Representative set: one query per result-shape class (decimal-sum agg,
double window, top-k with tie-break, iterative fixpoint, pandas-kernel,
greedy sequential per group).
"""

from __future__ import annotations

import pytest

from open_source_etl_spark.oracle import canonical_rows
from open_source_etl_spark.registry import all_queries

QUERIES = all_queries()

REPRESENTATIVE = [
    "q1_pricing_summary",          # decimal-sum aggregation
    "window_running_sum",          # window over per-key sort
    "limit_topn",                  # top-k with unique tie-break
    "dedup_connected_components",  # iterative fixpoint
    "multimodal_feature_histogram",  # Arrow pandas kernel
    "datapipe_pack_greedy",        # sequential-per-group applyInPandas
    "agg_salted_hotkey",           # two-phase salted aggregation
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_is_partition_count_invariant(spark, sf_dir, name):
    def run(parts: int):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            df = QUERIES[name](spark, sf_dir)
            return canonical_rows(df.columns, [tuple(r) for r in df.collect()])
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    narrow = run(3)
    wide = run(32)
    assert narrow == wide, f"{name}: result depends on shuffle partition count"
