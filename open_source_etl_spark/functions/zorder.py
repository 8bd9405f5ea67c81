"""Z-order (Morton) clustering keys for multi-dimensional data layout
(SURVEY.md §2B scale notes).

Sorting a 100 TB table by ONE key makes range scans on that key cheap
and every other key expensive; interleaving the bits of two (or more)
keys into a Morton code and sorting by THAT gives locality on all of
them at once — the layout trick behind Delta/Iceberg Z-ORDER, usable
here as a plain ORDER BY before a partitioned write.  Min/max parquet
row-group stats then prune scans on either dimension.

The code builds a pure bit-arithmetic Column (shift/and/or — JVM
codegen, no UDF), and `morton_sql` emits the identical arithmetic as
ANSI SQL so cross-engine oracles can verify the layout key exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: x occupies even bit positions, y odd."""
    xs = x.cast("bigint")
    ys = y.cast("bigint")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(Column.bitwiseOR, parts)


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """The same interleave as ANSI SQL over expressions ``x`` and ``y``
    (DuckDB-compatible; used by the layout query's oracle)."""
    parts = []
    for i in range(bits):
        parts.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        parts.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)
