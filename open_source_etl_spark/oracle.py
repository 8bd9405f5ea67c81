"""Local mirror of the driver's DuckDB differential-oracle check.

The driver runs each ``queries()`` entry and its ``oracle_sql()`` twin and
compares row-count + schema + order-insensitive value hash
(``/root/repo/__spark_entry__.py:1-39``).  This module reimplements that
comparison so the test suite catches parity breaks before the driver does.

Canonicalization choices (conservative — stricter than the driver needs):
- columns sorted by name, rows sorted by their full value tuple
- floats compared to 9 significant digits (queries themselves round
  presentation values; this guards only against 1-ulp formatting noise)
- timestamps normalized to naive microseconds
- arrays/lists compared element-wise with the same float rule
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        # tagged so an int result never silently equals a float result —
        # Spark/DuckDB type divergence (e.g. FLOOR: long vs double) must
        # surface here, since the driver's schema check would catch it
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0:
            return ("f", 0.0)
        return ("f", float(f"{v:.9g}"))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if hasattr(v, "asDict"):  # pyspark Row (struct value) — keep field names
        return tuple(sorted((k, _canon_value(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("f", float(f"{float(v):.9g}"))
    return v


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
    max_diff_shown: int = 5,
) -> CompareResult:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(oracle_sql)
    o_cols = [d[0] for d in rel.description]
    o_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(
            name, False, len(s_rows), len(o_rows),
            f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    if len(s_rows) != len(o_rows):
        return CompareResult(
            name, False, len(s_rows), len(o_rows),
            f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}",
        )
    s_canon = canonical_rows(s_cols, s_rows)
    o_canon = canonical_rows(o_cols, o_rows)
    if s_canon != o_canon:
        diffs = [
            f"  spark={s!r}\n  oracle={o!r}"
            for s, o in zip(s_canon, o_canon)
            if s != o
        ][:max_diff_shown]
        return CompareResult(
            name, False, len(s_rows), len(o_rows),
            "value mismatch (first diffs):\n" + "\n".join(diffs),
        )
    return CompareResult(name, True, len(s_rows), len(o_rows))


def run_all(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> list[CompareResult]:
    from .registry import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    con = duckdb_connection(sf_dir)
    results: list[CompareResult] = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        if name in oracles:
            results.append(compare(name, df, con, oracles[name]))
        else:
            n = df.count()
            results.append(
                CompareResult(name, n >= 0, n, -1, "rows-only (no oracle)")
            )
    return results
