"""Differential-oracle parity: every registered query vs its DuckDB twin.

Mirrors the driver's t2 gate (``/root/repo/__spark_entry__.py:1-39``) at
sf0.001 so breaks surface locally in seconds. ``OSETL_TEST_SF_DIR`` points
the same suite at sf0.01 for a pre-driver full check.
"""

from __future__ import annotations

import pytest

from open_source_etl_spark.oracle import compare, duckdb_connection
from open_source_etl_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        result = compare(name, df, con, ORACLES[name])
        assert result.ok, f"{name}: {result.detail}"
    else:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        assert len(df.columns) > 0


def test_compare_actually_fails_on_differences(spark, con, sf_dir):
    """Negative control for the harness itself: a wrong value, a wrong
    type kind, and a wrong row count must each produce ok=False — a
    comparator that never fails would make the whole green suite
    meaningless."""
    df = spark.sql("SELECT CAST(1 AS BIGINT) AS a, 'x' AS b")
    ok = compare("neg_ok", df, con, "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b")
    assert ok.ok
    wrong_value = compare(
        "neg_val", df, con, "SELECT CAST(2 AS BIGINT) AS a, 'x' AS b"
    )
    assert not wrong_value.ok
    wrong_kind = compare(
        "neg_kind", df, con, "SELECT 1.0 AS a, 'x' AS b"
    )
    assert not wrong_kind.ok, "int-vs-float kind divergence must fail"
    wrong_rows = compare(
        "neg_rows", df, con,
        "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b UNION ALL SELECT 1, 'x'",
    )
    assert not wrong_rows.ok
