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


def test_no_driver_hasher_hazards_in_any_output(spark, sf_dir):
    """Every declared query output must survive the driver's pandas hasher.

    Two classes broke CORRECTNESS_r01 rows (VERDICT.md #1-#3) and both are
    statically detectable without running a single job:

    - DuckDB HUGEINT oracle columns (bare SUM over integers) materialize as
      float64 in pandas while Spark returns bigint → hash mismatch.
    - Top-level Array/Struct/Map Spark columns (and LIST/STRUCT oracle
      columns) throw ``unhashable type: 'list'`` in the driver's
      ``sort_values`` canonicalizer.
    - Raw DECIMAL outputs materialize as Decimal objects (Spark/Arrow) vs
      float64 (DuckDB) → hash mismatch; cast to DOUBLE on both sides.
    - DATE outputs materialize as datetime.date objects (Spark) vs
      datetime64 (DuckDB) → hash mismatch; ship TIMESTAMP or a string.
    """
    import sys

    sys.path.insert(0, "tools")
    from audit_outputs import audit_oracle_types

    from open_source_etl_spark.oracle import duckdb_connection
    from pyspark.sql.types import DecimalType

    con = duckdb_connection(sf_dir)
    oracles = registry.all_oracles()
    oracle_bad = audit_oracle_types(con, oracles)
    oracle_bad += [
        (name, col, str(typ))
        for name, sql in sorted(oracles.items())
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall()
        if "DECIMAL" in str(typ).upper()
    ]
    assert not oracle_bad, f"oracle outputs break the driver hasher: {oracle_bad}"

    spark_bad = []
    probe_errors = []
    from pyspark.sql.types import ArrayType, DateType, MapType, StructType

    for name, fn in sorted(registry.all_queries().items()):
        try:
            fields = fn(spark, sf_dir).schema.fields
        except Exception as e:  # pragma: no cover - should not happen
            probe_errors.append((name, str(e).splitlines()[0]))
            continue
        for field in fields:
            if isinstance(
                field.dataType,
                (ArrayType, MapType, StructType, DecimalType, DateType),
            ):
                spark_bad.append((name, field.name, field.dataType.simpleString()))
    assert not probe_errors, f"schema probe failed: {probe_errors}"
    assert not spark_bad, f"Spark outputs break the driver hasher: {spark_bad}"


def test_salted_aggregate_rejects_non_decomposable(spark, sf_dir):
    from open_source_etl_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(li, ["l_returnflag"], {"m": ("l_quantity", "median")})
