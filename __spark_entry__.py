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
from open_source_etl_spark._precompile import ensure_bytecode  # noqa: E402

# the environment disables implicit bytecode caching; precompile once so
# Spark's Python workers load .pyc instead of recompiling the 10k-line
# codec modules on every process spin-up
ensure_bytecode()

_SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) at sf0.001."""
    tune_session(spark)
    return all_queries()["q1_pricing_summary"](spark, _SF_SMOKE)


def _sample_history() -> tuple[set[str], set[str], set[str]]:
    """(seen, failed, rows_only): query names with any
    CORRECTNESS_r{N}.json row from a previous round's driver sample,
    the subset whose LATEST row was a failure (comparator error or a
    rows/hash mismatch), and the subset whose LATEST row was a weak
    rows-only check (``err == "no_oracle"``) — those sampled before
    their value oracle landed and must be re-checked first once an
    oracle registers (VERDICT round 6, item 1)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                for name, row in json.load(f).items():
                    latest[name] = row
        except Exception:
            continue
    failed = {
        name
        for name, row in latest.items()
        if row.get("err") not in (None, "no_oracle")
        or row.get("rows_match") is False
        or row.get("schema_match") is False
        or row.get("hash_match") is False
    }
    rows_only = {
        name
        for name, row in latest.items()
        if row.get("err") == "no_oracle" and name not in failed
    }
    return set(latest), failed, rows_only


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B.

    DETERMINISTIC ROTATION (VERDICT round 4, item 1): the dict is
    ordered (previously-FAILED, then never-sampled, then passing), each
    group sorted by name.  A driver whose 50-query sample honors
    insertion order therefore re-checks known failures first and drains
    the never-sampled tail next; a driver that samples randomly is
    unaffected.  All queries remain present and callable either way.
    Regression safety for the passing tail (ADVICE round 4) is carried
    by tests/test_oracle_parity.py + test_perturbed_parity.py, which
    re-run the FULL registry against the same DuckDB comparator every
    round — the driver sample is not the only re-check.
    """

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def call(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        call.__doc__ = fn.__doc__
        return call

    registry = all_queries()
    seen, failed, rows_only = _sample_history()
    oracles = all_oracles()

    def rank(n: str) -> int:
        # A latest row of "no_oracle" for a query that NOW registers a
        # value oracle is stale proof, not passing history — re-check
        # it first, alongside outright failures (VERDICT r6 item 1).
        if n in failed or (n in rows_only and n in oracles):
            return 0
        return 1 if n not in seen else 2

    ordered = sorted(registry, key=lambda n: (rank(n), n))
    return {name: _wrap(registry[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query."""
    return all_oracles()
