"""Streaming operator builders: watermark + windowed aggregation,
sessionization, dedup, custom stateful processing (SURVEY.md §2B).

Each builder takes the (streaming) events DataFrame and returns the
transformed streaming DataFrame; ``runner.run_available_now`` executes it.
All builders also accept a *batch* DataFrame unchanged — the same code
path serves both, which is what makes batch-parity checks meaningful.

Scale notes (100 TB posture):
- every aggregation here is keyed on (window, type) or (user) — state is
  bounded by key cardinality × active windows, and the watermark evicts
  closed windows; without it state grows forever.
- windowed aggs shuffle once on the group key; Spark's streaming agg keeps
  partial state per shuffle partition (map-side partials apply as in batch).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def tumbling_window_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window count/sum per event_type.

    The watermark bounds state: windows older than (max ts − 30 min) are
    finalized and evicted.  Epoch-aligned boundaries, same as DuckDB's
    ``time_bucket`` — the oracle relies on that.
    """
    w = F.window(F.col("ts"), width)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window (width 2 h, slide 1 h) event counts: each event lands
    in width/slide = 2 overlapping windows; Spark expands the row into its
    windows before the keyed aggregation (one shuffle, state per window)."""
    w = F.window(F.col("ts"), width, slide)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "4 hours",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session windows: events merge while each arrives within
    ``gap`` of the session's end; only a gap STRICTLY > 4 h starts a new
    session (an event at exactly last-ts + gap still merges).  The
    session's end is last-event-ts + gap (Spark semantics; the oracle
    reproduces it with lag + cumulative-sum sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_keys(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming deduplication on a key subset.

    ``dropDuplicates`` keeps the first-seen row per key — *which* row wins
    is arrival-order-dependent, so only the key columns are projected,
    making the result deterministic (the distinct key set) while still
    exercising the stateful dedup operator.  The watermark lets Spark
    evict per-key state once no earlier duplicate can arrive.
    """
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicates(list(keys))
        .select(*keys)
    )


_ROLLUP_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)
_ROLLUP_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def stateful_user_rollup(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count / value total, emitted each micro-batch.

    This is the engine's escape hatch for semantics the built-in windowed
    aggs can't express (arbitrary per-key state machines).  State is one
    (n, total) pair per user — O(|users|), Arrow-batched per group; the
    built-in agg path is preferred wherever it suffices (UDFs are the
    slow path).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: Any,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(total, 4)],
                "last_ts": [last_ts],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_ROLLUP_OUT,
        stateStructType=_ROLLUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_interval_join(
    events: DataFrame,
    watermark: str = "1 hour",
    within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: pair each 'view' event with the same
    user's 'click' events that follow within 30 minutes.

    Both sides carry watermarks and the join condition bounds event time
    on BOTH ends — that pair of constraints is what lets Spark expire
    join state (a one-sided bound would buffer a side forever).  State
    per side ≈ watermark + interval window of rows, keyed by user.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
    )


def dedup_keys_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming dedup with TIME-BOUNDED state:
    ``dropDuplicatesWithinWatermark`` only guarantees dedup among events
    whose timestamps fall within the watermark delay of each other, which
    lets Spark evict key state aggressively — the right operator when
    duplicates are caused by at-least-once upstream delivery (retries land
    close together) and the key space is unbounded.  Key-only projection
    keeps the emitted set order-invariant, as in dedup_keys."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )


_TWS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_histogram(events: DataFrame) -> DataFrame:
    """Per-user event-type histogram via ``transformWithStateInPandas``
    (Spark 4's arbitrary-stateful-processing API, the successor to
    ``applyInPandasWithState``): one MapState(event_type → count) per
    user, the full histogram re-emitted each micro-batch in update mode.

    Why this API at 100 TB: typed composite state (Value/List/Map) lives
    in the RocksDB state store (required — set ``ROCKSDB_PROVIDER``
    before starting), so per-key state spills to local disk instead of
    executor heap, supports TTL, and checkpoint changelogs stay
    incremental.  MapState updates touch only the changed event_type
    entries, not the whole per-user blob (vs. the single-struct state of
    ``applyInPandasWithState`` in ``stateful_user_rollup``).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Histogram(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):  # type: ignore[override]
            import pandas as pd

            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    prev = (
                        self._counts.getValue((et,))
                        if self._counts.containsKey((et,))
                        else None
                    )
                    base = int(prev[0]) if prev is not None else 0
                    self._counts.updateValue((et,), (base + int(n),))
            items = [
                (key[0], k[0], int(v[0])) for k, v in self._counts.iterator()
            ]
            items.sort(key=lambda t: t[1])
            yield pd.DataFrame(
                items, columns=["user_id", "event_type", "n_events"]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Histogram(),
        outputStructType=_TWS_OUT,
        outputMode="update",
        timeMode="none",
    )


# transformWithStateInPandas drives its state protocol over protobuf
# (pyspark.sql.streaming.proto → google.protobuf); probe once at import.
try:  # pragma: no cover - environment probe
    import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

    HAS_TWS_PROTO = True
except ImportError:  # pragma: no cover
    HAS_TWS_PROTO = False

# Per-user histogram state for the fallback path: one map serialized as
# parallel arrays (applyInPandasWithState state structs can't hold maps).
_TWS_FALLBACK_STATE = StructType(
    [
        StructField("event_types", StringType()),  # '\x1f'-joined keys
        StructField("counts", StringType()),  # '\x1f'-joined bigint counts
    ]
)


def stateful_histogram(events: DataFrame) -> DataFrame:
    """Per-user event-type histogram as a custom stateful operator.

    Prefers ``transformWithStateInPandas`` (Spark 4 arbitrary-state v2:
    typed MapState in RocksDB, TTL, timers, incremental changelogs).  In
    environments without the protobuf runtime the v2 state protocol needs
    (this container), it falls back to the v1 ``applyInPandasWithState``
    API with the map encoded in the state struct — identical output
    semantics (same oracle), different state plumbing.  The fallback is
    declared, not hidden: check ``HAS_TWS_PROTO`` to see which path ran.
    """
    if HAS_TWS_PROTO:
        return transform_with_state_histogram(events)
    return _apply_in_pandas_histogram(events)


def _apply_in_pandas_histogram(events: DataFrame) -> DataFrame:
    """v1-API fallback for :func:`stateful_histogram`: the per-user
    event_type→count map lives in a single state struct as two
    delimiter-joined strings (v1 state structs are flat — no MapType),
    re-emitted in full each micro-batch in update mode."""
    SEP = "\x1f"

    def update(key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any):
        import pandas as pd

        if state.exists:
            et_s, n_s = state.get
            counts = dict(
                zip(et_s.split(SEP), (int(x) for x in n_s.split(SEP)))
            )
        else:
            counts = {}
        for pdf in pdfs:
            for et, n in pdf.groupby("event_type").size().items():
                counts[et] = counts.get(et, 0) + int(n)
        items = sorted(counts.items())
        state.update(
            (SEP.join(k for k, _ in items), SEP.join(str(v) for _, v in items))
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(items),
                "event_type": [k for k, _ in items],
                "n_events": [v for _, v in items],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TWS_OUT,
        stateStructType=_TWS_FALLBACK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
