"""Query registry: the t2 contract surface.

Every operator the engine claims (SURVEY.md §2B) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally with a DuckDB oracle
SQL twin.  ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin reads
of this registry, and the local test harness runs the same comparison the
driver does (row count + schema + order-insensitive value hash).

Ops without an oracle (LSH, approx sketches, streaming internals) register
with ``oracle=None`` and get the driver's weaker rows-only check — keep
that set minimal (SURVEY.md §7 risks).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from .operators import (  # noqa: F401
        aggregates,
        analytics_extras,
        analytics_extras2,
        analytics_suite,
        arrays_json,
        behavioral,
        datapipe_queries,
        dq_checks,
        graph_queries,
        ingestion,
        joins,
        llm_dedup,
        llm_similarity,
        llm_text,
        multimodal_queries,
        relational,
        relational_ext,
        setops,
        sortlimit,
        source_queries,
        streaming_queries,
        udf_queries,
        warehouse,
        windows,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def describe() -> list[dict[str, Any]]:
    load_all()
    return [
        {"name": n, "has_oracle": n in ORACLES, "doc": (f.__doc__ or "").strip().split("\n")[0]}
        for n, f in sorted(QUERIES.items())
    ]
