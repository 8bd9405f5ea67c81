"""Size-aware broadcast hinting.

A forced ``F.broadcast`` hint overrides AQE's size check — correct for
tables whose cardinality is bounded by the schema forever (nation = 25
rows, region = 5, 1-row stat frames), wrong for tables that merely START
small but scale linearly with the data (supplier: a few MB at sf0.1, ~1 B
rows at 100 TB).  ``maybe_broadcast`` is the policy seam: it applies the
hint only while Catalyst's own size estimate for the frame is under a
configured byte bound, and silently degrades to "no hint — AQE decides
from actual runtime sizes" past it.  A deployment moving up the scale
curve changes one config value, not ~15 query bodies
(VERDICT.md round 2, "What's wrong" #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Matches SCALE.md §2's stated broadcast budget: nothing estimated above
# this ever gets a forced hint.  Spark's own autoBroadcastJoinThreshold
# default is 10 MB; 32 MB is a deliberate bump for executors with the
# memory headroom this engine assumes (tune per deployment).
DEFAULT_BOUND_BYTES = 32 * 1024 * 1024
_BOUND_KEY = "spark.osetl.broadcast.maxBytes"


def broadcast_bound_bytes(spark) -> int:
    """The active bound: ``spark.osetl.broadcast.maxBytes`` if set (a
    deployment-level knob, settable per session), else the 32 MB default."""
    try:
        return int(spark.conf.get(_BOUND_KEY))
    except Exception:
        return DEFAULT_BOUND_BYTES


def estimated_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the frame's optimized logical plan
    (file-size based at the leaves, propagated through operators).  None
    when the estimate isn't reachable (e.g. Spark Connect) — callers must
    treat that as "unknown", not "small"."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


# (cache_key, bound-independent) -> estimated bytes.  Query functions are
# re-invoked with freshly-built DataFrames every call (bench, tests, the
# driver), and each estimate walks Catalyst analysis + optimization on the
# driver — ~10-20 ms per hint site, ~0.2 s on multi-hint queries like q7.
# The estimate is deterministic given the fixture dir + frame shape, so
# call sites pass a stable (sf_dir, label) key and pay Catalyst once per
# fixture.  The BOUND is re-read every call (still a live session knob).
_EST_CACHE: dict[tuple, int | None] = {}


def maybe_broadcast(
    df: DataFrame,
    bound_bytes: int | None = None,
    cache_key: tuple | None = None,
) -> DataFrame:
    """``F.broadcast(df)`` iff Catalyst estimates the frame under the
    bound; otherwise the frame unchanged (AQE picks the join strategy at
    runtime from ACTUAL sizes — which still broadcasts when the filtered
    result turns out small, without ever forcing an OOM-sized build side).

    Use for scaling tables hinted for bench-fixture speed (supplier and
    frames derived from it).  Schema-bounded dims (nation/region) and
    1-row stat frames keep their unconditional ``F.broadcast``.

    ``cache_key``: a stable identity for the frame's size — conventionally
    ``(sf_dir, label)`` — letting repeat invocations skip the per-call
    Catalyst stats walk.  Keys must change when the underlying data can
    (the fixture dir in the key covers that for this repo's layout).
    """
    if bound_bytes is None:
        bound_bytes = broadcast_bound_bytes(df.sparkSession)
    if cache_key is not None and cache_key in _EST_CACHE:
        est = _EST_CACHE[cache_key]
    else:
        est = estimated_size_bytes(df)
        # never cache a FAILED estimate (None): one transient Catalyst
        # hiccup must not pin "unknown -> no hint" for the process
        # lifetime — retry on the next invocation instead
        if cache_key is not None and est is not None:
            _EST_CACHE[cache_key] = est
    if est is not None and est <= bound_bytes:
        return F.broadcast(df)
    return df
