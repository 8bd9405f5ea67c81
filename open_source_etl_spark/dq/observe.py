"""Zero-extra-pass data-quality metrics via ``DataFrame.observe``.

The reference's validation pattern (`include/scripts/data_services/
data_validator.py:14-39`) runs its COUNT probes as separate queries
against the staged table — at 100 TB that means re-scanning the fact
table once per check.  Spark's ``Observation`` API attaches named
aggregate metrics to an existing job: the metrics are accumulated on the
executors WHILE the job runs its real work (a write, a count, an
aggregation), so the quality read costs zero additional scans — the
right validation shape for a pipeline that cannot afford a second pass.

Metrics must be aggregate expressions without DISTINCT (the observe
contract); the helpers below build the common null-rate / set-membership
/ range probes the reference's expectation suite uses, as observe-safe
conditional counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def null_count(col: str) -> Column:
    """Observe-safe count of NULLs in ``col``."""
    return F.sum(F.col(col).isNull().cast("bigint")).alias(f"{col}__nulls")


def out_of_set_count(col: str, allowed: list) -> Column:
    """Observe-safe count of non-NULL values outside ``allowed``."""
    bad = F.col(col).isNotNull() & ~F.col(col).isin(allowed)
    return F.sum(bad.cast("bigint")).alias(f"{col}__out_of_set")


def out_of_range_count(col: str, lo, hi) -> Column:
    """Observe-safe count of non-NULL values outside [lo, hi]."""
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return F.sum(bad.cast("bigint")).alias(f"{col}__out_of_range")


def row_count() -> Column:
    return F.count(F.lit(1)).alias("rows")


def observed(df: DataFrame, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach ``metrics`` to ``df``; read ``obs.get`` AFTER an action runs.

    Returns the instrumented frame and its Observation.  The caller runs
    its normal action (write / collect / count) on the returned frame and
    then reads the metric dict — one job, work + metrics together.
    """
    obs = Observation()
    return df.observe(obs, metrics[0], *metrics[1:]), obs


def validate_while_writing(
    df: DataFrame, path: str, *metrics: Column, fmt: str = "parquet"
) -> dict:
    """The production shape: land the data AND collect quality metrics in
    the same job.  Returns the metric dict; the write is the action."""
    out, obs = observed(df, *metrics)
    out.write.format(fmt).mode("overwrite").save(path)
    return dict(obs.get)
