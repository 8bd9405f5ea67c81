"""Skew mitigation: salted two-phase aggregation and salted broadcast
join (SURVEY.md §2B scale notes; §4 AQE skew handling).

AQE's skew-join splitting covers sort-merge joins at runtime; salting is
the *declarative* fallback for the two cases AQE doesn't reach:
a grouped aggregation where one key owns most rows (partial aggregation
already helps, but a pathological key still funnels into one reducer for
the final combine — salting splits THAT), and replicated joins against a
skewed key where the small side can be duplicated per salt.

Both transforms are semantics-preserving; tests/test_skew.py proves
salted == unsalted on real data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation with a random salt on the hot path.

    ``aggs`` maps output column → (input column, fn) for fn in
    {sum, count, min, max}: the decomposable aggregates (phase-2 combines
    are sum/sum/min/max respectively).  Non-decomposable aggs (median,
    collect) can't salt this way — use two-level keys or sketches.

    Phase 1 groups by (keys + salt): the hot key's rows spread over
    ``n_salts`` reducers.  Phase 2 groups by keys alone over the tiny
    phase-1 output.  Cost: one extra (small) shuffle; worst case a few %
    on balanced data, bounded-reducer memory on skewed data.
    """
    salted = df.withColumn(SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = []
    phase2 = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            phase1.append(F.sum(col).alias(out))
            phase2.append(F.sum(out).alias(out))
        elif fn == "count":
            phase1.append(F.count(col).alias(out))
            phase2.append(F.sum(out).cast("long").alias(out))
        elif fn == "min":
            phase1.append(F.min(col).alias(out))
            phase2.append(F.min(out).alias(out))
        elif fn == "max":
            phase1.append(F.max(col).alias(out))
            phase2.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = salted.groupBy(*keys, SALT_COL).agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a small side by replicating the
    small side across salts.

    The big side gets a random salt; the small side is exploded ×
    ``n_salts`` (still small) and broadcast.  Every salt bucket of a hot
    key joins independently — no single-task straggler.  Equivalent to a
    plain equi-join on ``key``; the salt columns never escape.
    """
    big_s = big.withColumn(SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_s.join(F.broadcast(small_s), [key, SALT_COL], how)
    return joined.drop(SALT_COL)


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and share of total — what you run
    BEFORE choosing a mitigation (salting / broadcast / AQE-only)."""
    total = df.count()
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        counts.withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
