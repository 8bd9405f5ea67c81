"""Concurrent query execution on one shared SparkSession.

A deployed engine serves many queries at once from a single session
(notebook servers, Thrift/Connect endpoints); operators must not
depend on session-global mutable state that concurrent callers would
clobber.  Two suites:

- same-dir: a diverse slice of the registry — plain DataFrame plans,
  temp-view-registering SQL queries, a Python UDTF, a mapInPandas
  codec, a SQL script — runs two rounds deep through a thread pool and
  must equal its sequential results.
- CROSS-DIR: the view-registering SQL queries run concurrently against
  TWO different fixture dirs (pristine + perturbed copy).  This is the
  arrangement that actually exposes the fixed-view-name race
  (``createOrReplaceTempView("orders")`` registered by both callers
  serves one caller the other's data): with ``catalog.scoped_view``
  names the two dirs never share a view, and each result must equal
  its own sequential run.  Reverting any operator to a fixed view name
  fails here, not in production.
"""

from __future__ import annotations

import os
import tempfile
from concurrent.futures import ThreadPoolExecutor

import pytest

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

# every query that registers a temp view — the surface the cross-dir
# race lives on
VIEW_QUERIES = [
    "udf_sql_scalar",
    "udtf_text_chunks",
    "sql_scripting_iterative",
    "agg_grouping_sets",
    "agg_listagg",
    "agg_bitmap_distinct",
    "subquery_exists",
    "subquery_scalar",
    "lateral_topk_per_group",
    "warehouse_recursive_calendar",
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


@pytest.fixture(scope="module")
def other_dir(sf_dir):
    """A SECOND fixture dir with DIFFERENT data (the perturbed copy), so
    a shared fixed-name view between the two dirs yields wrong rows."""
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from perturb_fixtures import perturb

    dst = os.path.join(tempfile.gettempdir(), "osetl-concurrency-perturbed")
    return perturb(sf_dir, dst)


def test_cross_dir_view_queries_stay_isolated(spark, sf_dir, other_dir):
    sequential = {}
    for d in (sf_dir, other_dir):
        for name in VIEW_QUERIES:
            sequential[(name, d)] = _rows(QUERIES[name](spark, d))

    # the perturbed copy must actually differ somewhere, or this test
    # proves nothing
    assert any(
        sequential[(n, sf_dir)] != sequential[(n, other_dir)]
        for n in VIEW_QUERIES
    ), "perturbed fixture identical to pristine — cross-dir guard is vacuous"

    jobs = [(n, d) for n in VIEW_QUERIES for d in (sf_dir, other_dir)]

    def run(job):
        name, d = job
        return job, _rows(QUERIES[name](spark, d))

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(run, jobs * 2))

    for job, rows in results:
        assert rows == sequential[job], (
            f"{job[0]} on {os.path.basename(job[1])} read another "
            "fixture dir's data under concurrency"
        )
