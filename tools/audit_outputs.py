"""Audit every registered query output for driver-hasher hazards.

Two bug classes broke CORRECTNESS_r01 rows (VERDICT.md "What's wrong" #1-#3):

1. DuckDB HUGEINT oracle columns (bare ``SUM(<integer>)``) — pandas
   materializes int128 as float64 while Spark returns bigint, so the
   driver's value hash diverges even when values are identical.
2. Top-level Array/Struct/Map columns in the Spark result — the driver
   canonicalizes through ``pandas.sort_values``, which throws
   ``TypeError: unhashable type: 'list'`` on nested cells.
3. DATE output columns — Spark's toPandas yields ``datetime.date`` objects
   while DuckDB's ``.df()`` yields ``datetime64``, so the same date hashes
   differently on the two sides.  Ship TIMESTAMP (or a formatted string).

This tool sweeps ALL oracles (``DESCRIBE <sql>`` in DuckDB — no execution)
and ALL Spark query schemas (lazy plan only — no job runs) and prints every
offending (query, column, type).  ``tests/test_registry.py`` runs the same
sweep as a permanent guard.
"""

from __future__ import annotations

import sys

import duckdb

SF_DIR = "/root/testdata/sf0.001"

_BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")
_NESTED_MARKERS = ("[]", "STRUCT", "MAP(")


def audit_oracle_types(con: duckdb.DuckDBPyConnection, oracles: dict[str, str]):
    """Return [(name, col, duck_type)] for HUGEINT or nested oracle outputs."""
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # pragma: no cover - surfaced to caller
            bad.append((name, "<describe failed>", str(e).splitlines()[0]))
            continue
        for col, typ, *_ in rows:
            t = str(typ).upper()
            if any(b in t for b in _BAD_ORACLE_TYPES):
                bad.append((name, col, t))
            elif any(m in t for m in _NESTED_MARKERS):
                bad.append((name, col, t))
            elif t == "DATE":
                bad.append((name, col, t))
    return bad


def audit_spark_schemas(spark, queries: dict, sf_dir: str = SF_DIR):
    """Return [(name, col, spark_type)] for nested top-level output columns."""
    from pyspark.sql.types import ArrayType, DateType, MapType, StructType

    bad = []
    errors = []
    for name, fn in sorted(queries.items()):
        try:
            df = fn(spark, sf_dir)
            fields = df.schema.fields
        except Exception as e:
            # queries with side-effect setup (ingest pipeline workdirs) can
            # fail schema-only probing; record and let the parity suite cover
            errors.append((name, str(e).splitlines()[0]))
            continue
        for field in fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType, DateType)):
                bad.append((name, field.name, field.dataType.simpleString()))
    return bad, errors


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from open_source_etl_spark.oracle import duckdb_connection
    from open_source_etl_spark.registry import all_oracles, all_queries
    from open_source_etl_spark.session import build_session

    con = duckdb_connection(SF_DIR)
    oracle_bad = audit_oracle_types(con, all_oracles())
    print(f"== oracle HUGEINT/nested columns: {len(oracle_bad)}")
    for name, col, typ in oracle_bad:
        print(f"  {name}: {col} -> {typ}")

    spark = build_session()
    spark_bad, errors = audit_spark_schemas(spark, all_queries())
    print(f"== spark nested output columns: {len(spark_bad)}")
    for name, col, typ in spark_bad:
        print(f"  {name}: {col} -> {typ}")
    print(f"== schema-probe errors (side-effect queries): {len(errors)}")
    for name, msg in errors:
        print(f"  {name}: {msg}")
    return 1 if (oracle_bad or spark_bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
