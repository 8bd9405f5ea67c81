"""Date-partition computation.

Reference semantics (`include/scripts/file_services/partitioner.py:7-25`,
`settings.txt:6-10`): a 3-level ``year/month/day`` suffix where month is
the lowercase full English month name (``strftime("%B").lower()``) and
year/day are plain ints.  The reference falls back to ``now()`` when no
date is given (`partitioner.py:18-22`); the engine makes the date a
required parameter to stay deterministic (SURVEY.md §7 "quirks").

Two forms:
- :func:`partition_suffix` — driver-side string, for object-store paths
  (the reference's use).
- :func:`partition_columns` — Column expressions, so a DataFrame write can
  ``partitionBy`` the same scheme and get Hive-style pruning for free.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTH_NAMES = (
    "january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december",
)

DEFAULT_LEVELS = ("year", "month", "day")


def partition_suffix(date: dt.date, levels: tuple[str, ...] = DEFAULT_LEVELS) -> str:
    """`year/month/day/` suffix for a concrete date.

    `partition_suffix(date(2021, 3, 7))` → `"2021/march/7/"` — the exact
    string shape of the reference (`partitioner.py:13-25`: month via
    `%B`.lower(), other levels via `getattr(date, level)`).
    """
    parts: list[str] = []
    for level in levels:
        if level == "month":
            parts.append(MONTH_NAMES[date.month - 1])
        else:
            parts.append(str(getattr(date, level)))
    return "/".join(parts) + "/"


def partition_columns(ts: Column | str, levels: tuple[str, ...] = DEFAULT_LEVELS) -> list[Column]:
    """The same scheme as Column expressions (named year/month/day), for
    ``df.withColumns(...)`` + ``write.partitionBy(*levels)``."""
    c = F.col(ts) if isinstance(ts, str) else ts
    out: list[Column] = []
    for level in levels:
        if level == "year":
            out.append(F.year(c).alias("year"))
        elif level == "month":
            out.append(F.lower(F.date_format(c, "MMMM")).alias("month"))
        elif level == "day":
            out.append(F.dayofmonth(c).alias("day"))
        else:
            raise ValueError(f"unknown partition level: {level}")
    return out
