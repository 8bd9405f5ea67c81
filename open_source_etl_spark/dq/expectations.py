"""Declarative expectations (the reference's Great Expectations suite).

Reference suite (`great_expectations/expectations/
bundesliga_match_scores_data_expectations.json:4-97`): one ordered
column-list check, two value-set checks, six not-null checks.  Each
expectation here compiles to a *counting expression* so the whole suite
folds into ONE aggregation pass (SURVEY.md §3.3 "Spark restatement") —
at 100 TB the suite costs one scan, not one scan per expectation (the
reference ships each expectation to Snowflake as its own query).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    """One check: either schema-level (evaluated on df.columns) or a
    row-level violation-counting expression."""

    name: str
    kind: str  # "schema" | "rows"
    column: str | None = None
    meta: dict[str, Any] = field(default_factory=dict)
    # rows-kind: expression counting VIOLATIONS (0 == pass)
    violation_expr: Column | None = None
    # schema-kind: callable df -> bool
    schema_check: Any = None


def expect_table_columns_to_match_ordered_list(expected: list[str]) -> Expectation:
    """Ordered schema equality (reference suite `…json:5-26`)."""
    return Expectation(
        name="expect_table_columns_to_match_ordered_list",
        kind="schema",
        meta={"expected": list(expected)},
        schema_check=lambda df: list(df.columns) == list(expected),
    )


def expect_column_values_to_be_in_set(column: str, allowed: list[Any]) -> Expectation:
    """Set membership (reference `…json:27-54`); NULLs don't violate
    (GE semantics: null values are skipped by value-set expectations)."""
    cond = F.col(column).isNotNull() & ~F.col(column).isin(allowed)
    return Expectation(
        name="expect_column_values_to_be_in_set",
        kind="rows",
        column=column,
        meta={"allowed": list(allowed)},
        violation_expr=F.sum(F.when(cond, 1).otherwise(0)),
    )


def expect_column_values_to_not_be_null(column: str) -> Expectation:
    """NOT NULL (reference `…json:55-96`, six instances)."""
    return Expectation(
        name="expect_column_values_to_not_be_null",
        kind="rows",
        column=column,
        violation_expr=F.sum(F.when(F.col(column).isNull(), 1).otherwise(0)),
    )


def expect_column_values_to_be_between(
    column: str, min_value: float | None = None, max_value: float | None = None
) -> Expectation:
    """Range expectation (standard GE family member; GEN)."""
    cond = F.lit(False)
    if min_value is not None:
        cond = cond | (F.col(column) < min_value)
    if max_value is not None:
        cond = cond | (F.col(column) > max_value)
    cond = F.col(column).isNotNull() & cond
    return Expectation(
        name="expect_column_values_to_be_between",
        kind="rows",
        column=column,
        meta={"min": min_value, "max": max_value},
        violation_expr=F.sum(F.when(cond, 1).otherwise(0)),
    )


def expect_column_values_to_be_unique(column: str) -> Expectation:
    """dbt `unique` test (`schema.yml:10-21`) as an expectation.

    Needs a distinct count, which can't ride the single fold pass —
    flagged via meta so the runner computes it in a second grouped pass.
    """
    return Expectation(
        name="expect_column_values_to_be_unique",
        kind="unique",
        column=column,
    )


# The reference's flagship suite, transcribed (SURVEY.md §2A.3 #17-20).
BUNDESLIGA_COLUMNS = [
    "value", "data_id", "round", "day", "date", "time", "home",
    "xg_home", "score", "xg_away", "away", "attendance", "venue", "referee",
]

BUNDESLIGA_ROUNDS = [
    "Regular Season",
    "German 1/2 Relegation/Promotion Play-offs",
    "German 1/2 Relegation/Promotion Playoffs",
]

BUNDESLIGA_DAYS = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]


def bundesliga_suite() -> list[Expectation]:
    """The reference's 9-expectation suite, verbatim semantics."""
    return [
        expect_table_columns_to_match_ordered_list(BUNDESLIGA_COLUMNS),
        expect_column_values_to_be_in_set("round", BUNDESLIGA_ROUNDS),
        expect_column_values_to_be_in_set("day", BUNDESLIGA_DAYS),
        *[
            expect_column_values_to_not_be_null(c)
            for c in ("date", "venue", "score", "attendance", "home", "away")
        ],
    ]
