"""Streaming operators as oracle-checkable queries (SURVEY.md §2B
streaming): watermark + tumbling/sliding/session windows, streaming
dedup, custom stateful processing.

Correctness protocol (SURVEY.md §7 step 7): each query runs a REAL
Structured Streaming job — file source → stateful transformation →
memory sink — driven to completion with ``Trigger.AvailableNow``, and the
DuckDB oracle computes the same result in batch SQL (batch-parity).  The
reference's only streaming notion is its S3 file sensor
(`dags/ingest_bundesliga_match_scores.py:54-67`); these generalize it to
incremental computation with bounded state.

Determinism notes: the fixture is a single parquet file → one micro-batch,
so update-mode emissions happen exactly once per key and "first-seen"
dedup is projected to its (order-invariant) key set.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..streaming import (
    dedup_keys,
    dedup_keys_within_watermark,
    stream_stream_interval_join,
    run_available_now,
    session_window_stats,
    sliding_window_counts,
    stateful_user_rollup,
    stream_events,
    tumbling_window_counts,
)


def _sink(name: str) -> str:
    return f"{name}_{uuid.uuid4().hex[:8]}"


def _state_parts(sf_dir: str) -> int:
    """Stateful-operator partition count DERIVED from the replayed
    source's size, not a constant: every shuffle partition owns a
    checkpointed state store, so the count should track data volume —
    ~32 MB of source per store, floor 8 (keep some width on tiny
    fixtures), cap 4096.  The sf0.1 events file (~2 MB) lands at 8; a
    100 TB backlog replays at thousands.  A long-lived deployment sizes
    it once to key cardinality × executors (repartitioning a live
    checkpoint requires a state rebuild)."""
    import os

    try:
        src_bytes = os.path.getsize(f"{sf_dir}/events.parquet")
    except OSError:
        src_bytes = 0
    return max(8, min(src_bytes // (32 << 20), 4096))


@query(
    "stream_tumbling_window_agg",
    oracle="""
    SELECT
      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
        AS window_end,
      event_type,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def stream_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed count/sum per event_type over the streamed
    events source; complete-mode memory sink equals the batch aggregation
    (epoch-aligned boundaries on both sides)."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        tumbling_window_counts(ev), _sink("tumb"), "complete", state_partitions=_state_parts(sf_dir)
    ).orderBy("window_start", "event_type")


@query(
    "stream_sliding_window_agg",
    oracle="""
    SELECT
      ws AS window_start,
      ws + INTERVAL 2 HOUR AS window_end,
      COUNT(*) AS n_events
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
               - to_hours(k) AS ws
      FROM events
      CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    GROUP BY ws
    ORDER BY ws
    """,
)
def stream_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour/1-hour windowed counts: every event contributes to
    two overlapping windows (the oracle expands each row into both window
    starts and re-aggregates)."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        sliding_window_counts(ev), _sink("slide"), "complete", state_partitions=_state_parts(sf_dir)
    ).orderBy("window_start")


@query(
    "stream_session_window_agg",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    marked AS (
      SELECT user_id, ts, value,
        -- STRICT >: Spark's session_window merges an event arriving at
        -- exactly last-ts + gap (probed empirically: 00:00 and 04:00
        -- merge under a 4h gap), so only a gap STRICTLY beyond the
        -- window end opens a new session
        CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 > INTERVAL 4 HOUR
             THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sess AS (
      SELECT user_id, ts, value,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT
      MIN(ts) AS session_start,
      MAX(ts) + INTERVAL 4 HOUR AS session_end,
      user_id,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 4) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def stream_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (4-hour inactivity gap).  Spark merges
    events whose windows overlap; session end = last event + gap.  The
    oracle reproduces exactly that with lag/cumulative-sum sessionization
    (new session iff the gap to the previous event is >= 4 h)."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        session_window_stats(ev), _sink("sess"), "complete", state_partitions=_state_parts(sf_dir)
    ).orderBy("user_id", "session_start")


@query(
    "stream_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication on (user_id, event_type) with watermarked
    state eviction; projecting only the keys makes the result the distinct
    key set, independent of which duplicate arrived first."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        dedup_keys(ev), _sink("dedup"), "append", state_partitions=_state_parts(sf_dir)
    ).orderBy("user_id", "event_type")


@query(
    "stream_stateful_user_rollup",
    oracle="""
    SELECT
      user_id,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 4) AS sum_value,
      MAX(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_stateful_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running totals in explicit group state, emitted in update mode.  The
    engine's escape hatch for per-key state machines the built-in windowed
    aggregations can't express."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        stateful_user_rollup(ev), _sink("rollup"), "update", state_partitions=_state_parts(sf_dir)
    ).orderBy("user_id")


@query(
    "stream_stream_join",
    oracle="""
    SELECT
      v.user_id,
      v.event_id AS view_id,
      c.event_id AS click_id,
      CAST(v.ts AS TIMESTAMP) AS view_ts,
      CAST(c.ts AS TIMESTAMP) AS click_ts
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
      AND v.event_type = 'view' AND c.event_type = 'click'
      AND c.ts >= v.ts
      AND c.ts <= v.ts + INTERVAL 30 MINUTE
    ORDER BY view_id, click_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (views ⋈ clicks within 30 min, per
    user), both sides watermarked so join state expires; equals the batch
    interval self-join."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        stream_stream_interval_join(ev), _sink("ssj"), "append", state_partitions=_state_parts(sf_dir)
    ).orderBy("view_id", "click_id")


@query(
    "stream_static_enrich",
    oracle="""
    SELECT
      e.event_id,
      e.user_id,
      e.event_type,
      c.c_name,
      c.c_mktsegment
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joined per
    micro-batch against a static table (no stream state at all, the
    static side re-resolves each batch).  The standard pattern for
    attaching slowly-changing reference data to a stream."""
    from pyspark.sql import functions as F

    from ..catalog import load_table

    ev = stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    # no forced broadcast: customer scales with the data; the per-batch
    # planner broadcasts it while it fits and falls back to a shuffled
    # stream-static join (or a pre-bucketed layout) when it doesn't
    enriched = ev.join(
        cust, ev.user_id == cust.c_custkey
    ).select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")
    return run_available_now(
        enriched, _sink("enrich"), "append", state_partitions=_state_parts(sf_dir)
    ).orderBy("event_id")


@query(
    "stream_dedup_within_watermark",
    # one micro-batch + key-only projection ⇒ the emitted set is exactly
    # the distinct key set, whatever the eviction timeline was
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with time-bounded state
    (``dropDuplicatesWithinWatermark``): unlike plain dropDuplicates, the
    state store only holds keys until the watermark passes them — the
    operator for at-least-once upstream retries over an unbounded key
    space, where keep-all-keys state would grow forever."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        dedup_keys_within_watermark(ev), _sink("dedup_wm"), "append", state_partitions=_state_parts(sf_dir)
    ).orderBy("user_id", "event_type")


@query(
    "stream_transform_with_state",
    # one micro-batch in update mode ⇒ each user's histogram is
    # emitted exactly once, fully accumulated
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing: a per-user MapState(event_type →
    count) histogram.  Prefers ``transformWithStateInPandas`` (Spark 4's
    successor to ``applyInPandasWithState`` — typed composite state, TTL,
    timers, incremental changelog checkpoints; needs the RocksDB state
    store and the protobuf runtime for its state protocol).  Where
    protobuf is absent (this container), ``streaming.stateful_histogram``
    falls back to an ``applyInPandasWithState`` implementation with
    identical output semantics — the fallback is declared via
    ``streaming.HAS_TWS_PROTO``, not hidden."""
    from ..streaming import HAS_TWS_PROTO, ROCKSDB_PROVIDER, stateful_histogram

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if HAS_TWS_PROTO:
        # mandatory for the v2 API (it rejects the HDFS-backed default)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        ev = stream_events(spark, sf_dir)
        return run_available_now(
        stateful_histogram(ev), _sink("tws"), "update", state_partitions=_state_parts(sf_dir)
    ).orderBy("user_id", "event_type")
    finally:
        if HAS_TWS_PROTO:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


@query(
    "stream_windowed_topk",
    oracle="""
    WITH counts AS (
      SELECT
        time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        event_type,
        COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    )
    SELECT window_start, event_type, CAST(n_events AS BIGINT) AS n_events,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n_events DESC, event_type) AS rk
      FROM counts
    )
    WHERE rk <= 2
    ORDER BY window_start, rk
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k event types per tumbling hour over the live stream: the
    streaming stage is the watermarked windowed count (bounded state,
    complete-mode memory sink) and the rank-and-filter runs on the sink
    table — the split Structured Streaming requires, since ranking
    windows aren't supported on a streaming aggregate.  This is also the
    production topology (serving-side ranking over a continuously
    maintained count table): the stream shuffles only (window, type)
    accumulator rows, and the per-window top-k sort touches
    |windows|×|types| rows, never raw events."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = stream_events(spark, sf_dir)
    counts = run_available_now(
        tumbling_window_counts(ev),
        _sink("topk"),
        "complete",
        state_partitions=_state_parts(sf_dir),
    )
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(
            F.col("n_events").desc(), "event_type"
        )
    )
    return (
        counts.select("window_start", "event_type", "n_events")
        .withColumn("rk", rk.cast("bigint"))
        .filter(F.col("rk") <= 2)
        .orderBy("window_start", "rk")
    )


@query(
    "stream_incremental_upsert",
    # the whole two-wave replay is deterministic from the events table:
    # wave 1 = days < d0+10, wave 2 = restatement of day d0+3 (values
    # doubled) + days >= d0+10; partition overwrite keeps wave-2 content
    # wherever wave 2 carried the partition
    oracle="""
    WITH b AS (
      SELECT event_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, value
      FROM events
    ), p AS (
      SELECT MIN(d) AS d0 FROM b
    ), final AS (
      SELECT event_id, d, value FROM b, p
      WHERE d < d0 + 10 AND d <> d0 + 3
      UNION ALL
      SELECT event_id, d, value * 2 FROM b, p WHERE d = d0 + 3
      UNION ALL
      SELECT event_id, d, value FROM b, p WHERE d >= d0 + 10
    )
    SELECT CAST(year(d) AS INT) AS year,
           lower(monthname(d)) AS month,
           CAST(day(d) AS INT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM final
    GROUP BY 1, 2, 3
    ORDER BY year, month, day
    """,
)
def stream_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming foreachBatch partition upsert as a driver-checkable query
    (the ``streaming/pipelines.stream_upsert_partitions`` library surface,
    previously test-only): two CSV waves drain through ONE caller-owned
    checkpoint — wave 1 lands the history, wave 2 RESTATES one day
    (values doubled) and appends new days — and dynamic partition
    overwrite inside ``foreachBatch`` rewrites exactly the partitions
    each micro-batch carries.  The checkpoint guarantees run 2 processes
    only the new file: exactly-once across restarts, the reference's
    re-land-one-dated-partition semantics made continuous.

    Every cutoff is DERIVED from the data (d0 = min event date), so a
    regenerated fixture with a shifted date range replays identically on
    both engines.  Scale: file discovery is incremental, the upsert
    writes only touched partitions, and the final aggregate groups the
    partition columns — all executor-parallel.
    """
    import os
    import tempfile as _tf

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..streaming.pipelines import stream_upsert_partitions

    from ..catalog import load_table

    # load_table, NOT a raw parquet read: it normalizes the ts column's
    # physical form (TIMESTAMP_NANOS drops ship as bigint under
    # nanosAsLong — a raw read would cast raw nanos as seconds)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.to_date(F.col("ts").cast("timestamp")).alias("d"), "value"
    )
    d0 = ev.agg(F.min("d")).first()[0]
    if d0 is None:  # empty fixture: nothing to land
        return spark.createDataFrame(
            [], "year int, month string, day int, n_events bigint, total_value double"
        )
    import datetime as _dt

    restate = d0 + _dt.timedelta(days=3)
    cutoff = d0 + _dt.timedelta(days=10)

    feed_cols = [
        F.col("event_id"),
        F.date_format("d", "yyyy-MM-dd").alias("date"),
        F.col("value"),
    ]
    wave1 = ev.filter(F.col("d") < F.lit(cutoff)).select(*feed_cols)
    # one scan for wave 2 (r15): the restated day and the new days fold
    # into a single disjunctive filter with a conditional value — same
    # rows as the old two-branch union (the branches were disjoint:
    # restate < cutoff), one events pass instead of two
    wave2 = (
        ev.filter(
            (F.col("d") == F.lit(restate)) | (F.col("d") >= F.lit(cutoff))
        )
        .select(
            "event_id",
            F.date_format("d", "yyyy-MM-dd").alias("date"),
            F.when(
                F.col("d") == F.lit(restate), F.col("value") * 2
            ).otherwise(F.col("value")).alias("value"),
        )
    )

    workdir = _tf.mkdtemp(prefix="osetl-stream-upsert-q-")
    source_dir = os.path.join(workdir, "feed")
    store = os.path.join(workdir, "store")
    checkpoint = os.path.join(workdir, "checkpoint")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("date", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    # the feeds are presentation-sized CSV waves; coalesce(1) keeps one
    # file per wave so each run drains exactly one new file
    wave1.coalesce(1).write.mode("append").option("header", "true").csv(source_dir)
    stream_upsert_partitions(
        spark, source_dir, store, schema, checkpoint, date_column="date"
    )
    wave2.coalesce(1).write.mode("append").option("header", "true").csv(source_dir)
    stream_upsert_partitions(
        spark, source_dir, store, schema, checkpoint, date_column="date"
    )

    from ._localize import localize

    landed = spark.read.parquet(store)
    return localize(
        landed.groupBy(
            F.col("year").cast("int").alias("year"),
            F.col("month").cast("string").alias("month"),
            F.col("day").cast("int").alias("day"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("year", "month", "day"),
        workdir,
    )
