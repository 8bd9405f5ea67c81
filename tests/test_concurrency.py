"""Concurrent query execution on one shared SparkSession.

A deployed engine serves many queries at once from a single session
(notebook servers, Thrift/Connect endpoints); operators must not
depend on session-global mutable state that concurrent callers would
clobber.  This suite runs a diverse slice of the registry — plain
DataFrame plans, temp-view-registering SQL queries, a Python UDTF, a
mapInPandas codec, an iterative graph kernel, and a SQL script — from
a thread pool against one session and asserts every result equals its
sequential run.  The view-name race this guards against is real: a
fixed `createOrReplaceTempView("orders")` registered by two concurrent
callers with different fixture dirs silently serves one caller the
other's data (udf_queries._scoped_view is the fix pattern).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from open_source_etl_spark.registry import all_queries

QUERIES = all_queries()

CONCURRENT_SET = [
    "q1_pricing_summary",          # plain DataFrame agg
    "q7_nation_trade_volume",      # multi-join with broadcast hints
    "udf_sql_scalar",              # temp view + SQL temp function
    "udtf_text_chunks",            # temp view + Python UDTF
    "sql_scripting_iterative",     # SQL script with session variables
    "agg_grouping_sets",           # temp-view SQL
    "multimodal_gif_decode",       # mapInPandas codec kernel
    "dedup_exact",                 # hash aggregation
    "window_topk_per_group",       # window
    "graph_degree_distribution",   # graph derivation
]


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_concurrent_queries_match_sequential(spark, sf_dir):
    sequential = {
        name: _rows(QUERIES[name](spark, sf_dir)) for name in CONCURRENT_SET
    }

    def run(name):
        return name, _rows(QUERIES[name](spark, sf_dir))

    # two full rounds of the set in flight at once: 20 concurrent builds
    # + executions over one session
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(run, CONCURRENT_SET * 2))

    for name, rows in results:
        assert rows == sequential[name], f"{name} diverged under concurrency"
