"""Generic temporal joins as reusable DataFrame functions.

The query registry proves the semantics (``join_asof``,
``join_asof_nearest``, ``warehouse_point_in_time_join``); this module is
the user-facing API a reference migrator calls on their own tables.

All variants use the union-and-running-value formulation: tag both
inputs, union them on the key/timestamp spine, and carry the latest (or
next) right-side payload along each key's timeline with ONE window pass
— the stream is shuffled exactly once on the key, per-row state is O(1),
and there is no per-fact range probe.  That is the only as-of shape that
holds at 100 TB: the naive inequality join explodes, and per-key
``collect`` does not distribute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join ``left`` rows to the temporally closest ``right`` row
    per key.

    direction: "backward" (latest right with ts <= left ts — the PIT /
    feature-store rule: no future leakage), "forward" (earliest right
    with ts >= left ts), or "nearest" (closer of the two, ties backward).
    ``tolerance_seconds`` drops matches further away than the bound.
    Right-side payload columns are appended with ``suffix``; left rows
    with no admissible match keep NULL payloads (left-outer semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")

    payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    r_payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        r_payload.alias("__r"),
        *[F.lit(None).cast(t.dataType).alias(f"__l_{c}") for c, t in zip(left.columns, left.schema.fields)],
    )
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    u = l_tagged.unionByName(r_tagged)

    # backward: right rows sort BEFORE left rows at equal ts, so a
    # running last() over (..., -1] still admits the same-timestamp right
    # row; forward mirrors it with right rows after left rows.  The
    # payload struct is the final sort key so DUPLICATE right timestamps
    # resolve deterministically: backward takes the greatest payload at
    # the tied instant, forward the smallest (a consequence of scan
    # direction) — dedupe the right side upstream to pick a specific row.
    back_w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__is_left", "__r")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd_w = (
        Window.partitionBy("__key")
        .orderBy("__t", F.col("__is_left").desc(), "__r")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    out = u
    if direction in ("backward", "nearest"):
        out = out.withColumn(
            "__back", F.last("__r", ignorenulls=True).over(back_w)
        )
    if direction in ("forward", "nearest"):
        out = out.withColumn(
            "__fwd", F.first("__r", ignorenulls=True).over(fwd_w)
        )

    sec = lambda c: F.col(c).cast("double")  # noqa: E731
    if direction == "backward":
        out = out.withColumn("__m", F.col("__back"))
    elif direction == "forward":
        out = out.withColumn("__m", F.col("__fwd"))
    else:
        back_gap = sec("__t") - F.col("__back.__ts").cast("double")
        fwd_gap = F.col("__fwd.__ts").cast("double") - sec("__t")
        out = out.withColumn(
            "__m",
            F.when(F.col("__fwd").isNull(), F.col("__back"))
            .when(F.col("__back").isNull(), F.col("__fwd"))
            .when(back_gap <= fwd_gap, F.col("__back"))
            .otherwise(F.col("__fwd")),
        )
    if tolerance_seconds is not None:
        gap = F.abs(sec("__t") - F.col("__m.__ts").cast("double"))
        out = out.withColumn(
            "__m", F.when(gap <= float(tolerance_seconds), F.col("__m"))
        )

    result = out.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    return result
