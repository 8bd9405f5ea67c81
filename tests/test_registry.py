"""Registry and library guardrails (negative paths)."""

from __future__ import annotations

import pytest

from open_source_etl_spark import registry
from open_source_etl_spark.functions.skew import salted_aggregate


def test_duplicate_query_name_rejected():
    @registry.query("_test_dup_guard")
    def q1(spark, sf_dir):  # pragma: no cover - registration only
        raise NotImplementedError

    try:
        with pytest.raises(ValueError, match="duplicate query name"):

            @registry.query("_test_dup_guard")
            def q2(spark, sf_dir):  # pragma: no cover
                raise NotImplementedError

    finally:
        registry.QUERIES.pop("_test_dup_guard", None)


def test_every_oracle_has_a_query():
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    orphan = set(oracles) - set(queries)
    assert not orphan, f"oracles without queries: {orphan}"


def test_salted_aggregate_rejects_non_decomposable(spark, sf_dir):
    from open_source_etl_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(li, ["l_returnflag"], {"m": ("l_quantity", "median")})
