"""Suite runner: fold every row-level expectation into one aggregation.

Reference: `DataValidator.validate_staging_table_data`
(`include/scripts/file_services/data_validator.py:14-39`) binds a suite to
a full-table batch, runs a checkpoint, persists results, and returns
``result["success"]``.  Engine version: one ``df.agg(...)`` evaluating all
violation counters in a single scan, a dict result, and an optional JSON
report file (the checkpoint-store analogue, `…checkpoint.yml:9-20`).
"""

from __future__ import annotations

import datetime as dt
import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .expectations import Expectation


@dataclass
class ValidationResult:
    success: bool
    checked_at: str
    row_count: int
    results: list[dict[str, Any]] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "success": self.success,
                "checked_at": self.checked_at,
                "row_count": self.row_count,
                "results": self.results,
            },
            indent=2,
        )


def validate(
    df: DataFrame,
    suite: list[Expectation],
    report_path: str | None = None,
) -> ValidationResult:
    """Run a suite in (at most) two passes: one fold for all counting
    expectations, one grouped pass if any uniqueness checks exist."""
    outcomes: list[dict[str, Any]] = []

    schema_checks = [e for e in suite if e.kind == "schema"]
    row_checks = [e for e in suite if e.kind == "rows"]
    unique_checks = [e for e in suite if e.kind == "unique"]

    for exp in schema_checks:
        ok = bool(exp.schema_check(df))
        outcomes.append({"expectation": exp.name, "column": None, "success": ok, **exp.meta})

    row_count = 0
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("__row_count")] + [
            exp.violation_expr.alias(f"v{i}") for i, exp in enumerate(row_checks)
        ]
        row = df.agg(*aggs).first()
        row_count = row["__row_count"]
        for i, exp in enumerate(row_checks):
            violations = row[f"v{i}"] or 0
            outcomes.append(
                {
                    "expectation": exp.name,
                    "column": exp.column,
                    "success": violations == 0,
                    "violations": int(violations),
                    **exp.meta,
                }
            )
    else:
        row_count = df.count()

    for exp in unique_checks:
        dupes = (
            df.groupBy(exp.column).count().filter(F.col("count") > 1).count()
        )
        outcomes.append(
            {
                "expectation": exp.name,
                "column": exp.column,
                "success": dupes == 0,
                "duplicate_keys": int(dupes),
            }
        )

    result = ValidationResult(
        success=all(o["success"] for o in outcomes),
        checked_at=dt.datetime.now(dt.timezone.utc).isoformat(),
        row_count=int(row_count),
        results=outcomes,
    )
    if report_path:
        os.makedirs(os.path.dirname(report_path) or ".", exist_ok=True)
        with open(report_path, "w") as fh:
            fh.write(result.to_json())
    return result
