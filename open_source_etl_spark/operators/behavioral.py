"""Behavioral / event-sequence analytics over the ``events`` table:
sessionization, funnel conversion, cohort retention, path mining, and
rolling activity — the clickstream workload a warehouse replacement runs
beside the relational suite.

Provenance: GEN (SURVEY.md §2B) — the reference's event-shaped data stops
at ingestion; these are the standard downstream analyses any engine
swap-in must cover.

Scale notes: every query here partitions its windows by ``user_id`` (or
aggregates first and windows over a tiny per-day series), so per-partition
state stays bounded at 100 TB — there is no global window.  Sessionization
is the classic gaps-and-islands rewrite (lag → flag → running sum), which
costs exactly one shuffle on user_id; funnel steps reuse one aggregated
per-user frame per stage, each |users|-sized, so the stage joins broadcast.

``events.ts`` is microsecond TIMESTAMP parquet (older fixture drops were
TIMESTAMP(NANOS), normalized in catalog.py); the DuckDB oracles CAST to
TIMESTAMP (microseconds) to match either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "behavior_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  <= INTERVAL 6 HOUR
             THEN 0 ELSE 1 END AS new_session
      FROM e
    ), numbered AS (
      SELECT user_id, ts, value,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY 1, 2
    ORDER BY user_id, session_id
    """,
)
def behavior_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (6-hour inactivity gap) via gaps-and-islands:
    lag marks session starts, a running sum numbers them, one groupBy
    collapses each island.  All three windows share the (user_id, ts)
    shuffle+sort, so Spark executes them in a single exchange."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    # Interval comparison works for both TIMESTAMP and TIMESTAMP_NTZ inputs
    # (a long cast is illegal on NTZ in Spark 4).
    gap_ok = F.col("ts") - F.lag("ts").over(w) <= F.expr("INTERVAL 6 HOURS")
    flagged = ev.withColumn(
        "new_session", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "behavior_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
      FROM events WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
      GROUP BY 1
    ), p AS (
      SELECT e.user_id
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
      GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
)
def behavior_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each stage keeps users whose
    earliest qualifying event strictly follows their previous stage's
    anchor time.

    One user-keyed shuffle, zero joins: the stage anchors are nested
    conditional window-mins over the same ``user_id`` partition (t_view →
    t_click > t_view → t_buy > t_click share one exchange), then a per-user
    collapse and a global 1-row count.  Round 1 broadcast each |users|-sized
    stage frame (VERDICT.md "What's wrong" #5) — at 100 TB |users| is itself
    huge, so user-cardinality frames must never be broadcast.

    Anonymous events (NULL user_id) are excluded up front: a window
    PARTITION BY groups all NULLs into one pseudo-user that would
    "advance" through the funnel, while SQL equi-joins drop them — the
    explicit filter keeps both engines honest."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_type")
    )
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    e = e.withColumn("t_click", t_click)
    t_buy = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    e = e.withColumn("t_buy", t_buy)
    per_user = e.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_buy").alias("t_buy"),
    )
    return per_user.agg(
        F.count("t_view").cast("bigint").alias("n_view"),
        F.count("t_click").cast("bigint").alias("n_view_click"),
        F.count("t_buy").cast("bigint").alias("n_view_click_purchase"),
    )


@query(
    "behavior_retention",
    oracle="""
    WITH ue AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), cohort AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
      FROM ue GROUP BY 1
    )
    SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(DATE_DIFF('day', c.cohort_week, DATE_TRUNC('week', e.ts)) / 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM ue e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def behavior_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: cohort = week of first activity,
    cell = distinct users from that cohort active k weeks later.

    The cohort anchor is a window-min over the ``user_id`` partition — no
    |users|-sized frame is materialized or broadcast (round 1 broadcast
    the cohort map, a 100 TB OOM; VERDICT.md "What's wrong" #5), and the
    retention rollup reuses the same user-keyed exchange.  Both week
    columns truncate to Monday midnight, so the day-diff is an exact
    multiple of 7 in both engines; cohort_week stays TIMESTAMP because
    DATE outputs materialize differently through pandas on the two driver
    paths (datetime.date vs datetime64)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    wu = Window.partitionBy("user_id")
    cohort_ts = F.date_trunc("week", F.min("ts").over(wu))
    return (
        ev.withColumn("cohort_week_ts", cohort_ts)
        .groupBy(
            F.col("cohort_week_ts").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week_ts"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "behavior_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
        LEAD(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt1,
        LEAD(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt2
      FROM events
    )
    SELECT event_type || '>' || nxt1 || '>' || nxt2 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE nxt1 IS NOT NULL AND nxt2 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def behavior_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-event sequences across user
    timelines.  Two leads over one (user_id, ts, event_id) window — a
    single shuffle+sort — then an ordinary count aggregation; the unique
    event_id tie-break keeps the sequence (and thus the counts)
    deterministic across engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    return (
        seq.filter(F.col("nxt1").isNotNull() & F.col("nxt2").isNotNull())
        .groupBy(
            F.concat_ws(">", "event_type", "nxt1", "nxt2").alias("path")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@query(
    "behavior_daily_ma7",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(day AS TIMESTAMP) AS day, event_type, n,
      CAST(AVG(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma7
    FROM daily
    ORDER BY event_type, day
    """,
)
def behavior_daily_ma7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling activity: events per (day, type) with a trailing 7-row
    moving average.  The heavy aggregation happens first (map-side partial
    counts), so the window runs over a tiny per-day series; the averaged
    counts are small integers, making the double mean bit-exact across
    engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    return (
        daily.withColumn("ma7", F.avg(F.col("n").cast("double")).over(w).cast("double"))
        # DATE outputs materialize as datetime.date (Spark) vs datetime64
        # (DuckDB) through the driver's pandas path — ship TIMESTAMP
        .withColumn("day", F.col("day").cast("timestamp"))
        .orderBy("event_type", "day")
    )


@query(
    "timeseries_gapfill_ffill",
    oracle="""
    WITH b AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), spans AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM b GROUP BY 1
    ), spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    ), daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM b GROUP BY 1, 2
    )
    SELECT s.user_id AS user_id, CAST(s.day AS TIMESTAMP) AS day,
      CAST(d.day_value IS NOT NULL AS BOOLEAN) AS observed,
      last_value(d.day_value IGNORE NULLS) OVER (
        PARTITION BY s.user_id ORDER BY s.day
        ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, s.day
    """,
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a per-user daily date spine (sequence +
    explode — generated distributed, not on the driver) left-joined to
    observed daily totals, forward-filled with last(ignorenulls) over a
    running frame.  The spine explodes ~|days| rows per user inside each
    partition, and the fill window rides the same (user_id, day) shuffle
    as the join — one exchange end-to-end."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    spans = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("day_value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            # TIMESTAMP output: DATE diverges through the driver's pandas path
            F.col("day").cast("timestamp").alias("day"),
            F.col("day_value").isNotNull().alias("observed"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "behavior_burst_detect",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, hour, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY hour
                          RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                                    AND INTERVAL 1 HOUR PRECEDING) AS sum_baseline,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY hour
                            RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                                      AND INTERVAL 1 HOUR PRECEDING) AS n_baseline
      FROM hourly
    )
    SELECT event_type, hour, n,
           ROUND(CAST(sum_baseline AS DOUBLE) / n_baseline, 4) AS baseline,
           -- pure integer cross-multiply: n > 1.5x (sum/count) baseline
           (n_baseline > 0 AND 2 * n * n_baseline > 3 * sum_baseline)
             AS is_burst
    FROM scored
    ORDER BY event_type, hour
    """,
)
def behavior_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal burst detection: hourly event counts per type scored
    against their trailing-24h baseline (RANGE frame over event time,
    excluding the current hour), flagged when the hour runs over 1.5x
    the baseline — rate-spike alerting, the time-series complement of
    the global z-score outlier check (dq_outlier_zscore).

    The burst predicate cross-multiplies the windowed integer SUM
    directly (never avg x count float reconstruction) so the flag can't
    hinge on float representation or cast rounding.  One shuffle for the hourly rollup, one sort per
    event_type partition for the frame — the same plan at any scale;
    state is |types| x 25 hourly counts.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("event_type", F.col("w.start").alias("hour"), "n")
    )
    # RANGE frame over epoch seconds: 24h window ending 1h before now
    wspec = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour").cast("long"))
        .rangeBetween(-24 * 3600, -3600)
    )
    scored = hourly.select(
        "event_type",
        "hour",
        "n",
        F.sum("n").over(wspec).alias("sum_baseline"),
        F.count("*").over(wspec).alias("n_baseline"),
    )
    return scored.select(
        "event_type",
        "hour",
        "n",
        F.round(
            F.col("sum_baseline").cast("double") / F.col("n_baseline"), 4
        ).alias("baseline"),
        (
            (F.col("n_baseline") > 0)
            & (2 * F.col("n") * F.col("n_baseline") > 3 * F.col("sum_baseline"))
        ).alias("is_burst"),
    ).orderBy("event_type", "hour")


@query(
    "behavior_ab_test",
    oracle="""
    WITH assigned AS (
      SELECT event_type, value,
             CASE WHEN ((user_id * 2654435761 + 101) % 2147483648) % 100 < 50
                  THEN 'treatment' ELSE 'control' END AS variant
      FROM events
      WHERE event_type IN ('click', 'purchase', 'view')
    )
    SELECT event_type, variant,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS mean_value
    FROM assigned
    GROUP BY event_type, variant
    ORDER BY event_type, variant
    """,
)
def behavior_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned
    50/50 to treatment/control (same multiplicative-hash family as the
    split/sample ops — assignment is reproducible and user-sticky, never
    per-event RNG), then per-(event_type, variant) volume and mean value.
    The uplift read is mean_value(treatment) − mean_value(control) per
    metric; means divide an exact decimal sum by a count, so both
    engines report identical figures."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase", "view")
    )
    bucket = ((F.col("user_id") * 2654435761 + 101) % 2147483648) % 100
    assigned = ev.withColumn(
        "variant", F.when(bucket < 50, "treatment").otherwise("control")
    )
    dsum_val = F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
    return (
        assigned.groupBy("event_type", "variant")
        .agg(
            F.count("*").alias("n_events"),
            dsum_val.alias("total_value"),
            F.round(dsum_val / F.count("*"), 6).alias("mean_value"),
        )
        .orderBy("event_type", "variant")
    )


@query(
    "behavior_attribution_last_touch",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE user_id IS NOT NULL
    ), touched AS (
      SELECT *,
        LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS) OVER w AS channel,
        LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts END
                   IGNORE NULLS) OVER w AS touch_ts
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS attributed_value
    FROM touched
    WHERE event_type = 'purchase' AND channel IS NOT NULL
      AND ts - touch_ts <= INTERVAL 7 DAY
    GROUP BY channel
    ORDER BY channel
    """,
)
def behavior_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    most recent preceding non-purchase event by the same user within a
    7-day lookback.

    The "most recent preceding touch" is ``last(..., ignorenulls=True)``
    over an unbounded-preceding row frame — Spark keeps one running
    value per partition, so the pass is a single user_id shuffle with
    O(1) window state per key, the same gaps-and-islands machinery as
    sessionization (no as-of self-join, which would re-shuffle the
    events twice).  Value sums go through DECIMAL so both engines add
    exactly; the 7-day cutoff compares native timestamps."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    touched = ev.select(
        "user_id",
        "event_type",
        "value",
        "ts",
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("channel"),
        F.last(F.when(non_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    return (
        touched.filter(
            (F.col("event_type") == "purchase")
            & F.col("channel").isNotNull()
            & (
                F.col("ts").cast("long") - F.col("touch_ts").cast("long")
                <= 7 * 86400
            )
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_conversions"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("attributed_value"),
        )
        .orderBy("channel")
    )


@query(
    "timeseries_repeat_interval",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ), intervals AS (
      SELECT f.o_custkey,
             date_diff('day', f.d, s.d) AS days_between
      FROM ranked f JOIN ranked s
        ON f.o_custkey = s.o_custkey AND f.rn = 1 AND s.rn = 2
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
           ROUND(AVG(days_between), 4) AS avg_days,
           ROUND(median(days_between), 4) AS median_days,
           ROUND(quantile_cont(days_between, 0.9), 4) AS p90_days
    FROM intervals i JOIN customer c ON i.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def timeseries_repeat_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-repeat-purchase survival summary: days between each
    customer's first and second order, distributed per market segment
    (mean / median / p90, linear-interpolated on both engines).

    One user-keyed window ranks orders (tie-broken on orderkey), a
    conditional ``min_by``-free self-pair picks ranks 1 and 2, and the
    segment rollup is a plain hash agg after the customer dimension
    join.  The window is the only big shuffle; per-key state is one
    counter.  Exact percentiles over the per-customer intervals frame
    (|customers| rows, already 1000× smaller than orders) are fine at
    any scale — the raw-fact percentile variant is what
    ``agg_approx_quantile`` covers with the GK sketch."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 2)
    first = ranked.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("d").alias("d1")
    )
    second = ranked.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("d").alias("d2")
    )
    intervals = first.join(second, "o_custkey").select(
        "o_custkey", F.datediff("d2", "d1").alias("days_between")
    )
    return (
        intervals.join(cust, intervals.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_repeat_customers"),
            F.round(F.avg("days_between"), 4).alias("avg_days"),
            F.round(F.median("days_between"), 4).alias("median_days"),
            F.round(F.percentile("days_between", F.lit(0.9)), 4).alias(
                "p90_days"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "behavior_markov_transition",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events WHERE user_id IS NOT NULL
    ), pairs AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS prob
    FROM pairs
    ORDER BY from_type, to_type
    """,
)
def behavior_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type).

    One user-keyed window (lead) forms consecutive pairs, a hash agg
    counts them, and row-normalization is a window over the
    |types|² count frame — the raw stream is shuffled once on user_id
    and everything after runs on a bounded matrix.  The path-mining
    companion to ``behavior_path_trigrams`` (which counts whole
    3-step paths; this gives the normalized step kernel that feeds
    simulation / next-action prediction)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wn = Window.partitionBy("from_type")
    return (
        pairs.select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.sum("n").over(wn), 6).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "behavior_event_regex",
    # Parity note: both engines count non-overlapping matches of the
    # same patterns over the same journey string.  The patterns are
    # chosen UNAMBIGUOUS — in S[CV]*P the [CV]* run can never absorb
    # the terminating P, and E{2,}'s maximal-run matches are unique —
    # so Java regex (leftmost-greedy) and RE2 (leftmost-longest) agree
    # on every match; an ambiguous pattern would not be
    # engine-portable.
    oracle="""
    WITH j AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             string_agg(upper(substr(event_type, 1, 1)), ''
                        ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS journey
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(journey, 'S[CV]*P'))
                AS BIGINT) AS n_conversions,
           CAST(COALESCE(list_sum(list_transform(
                  regexp_extract_all(journey, 'S[CV]*P'),
                  m -> len(m))), 0) AS BIGINT) AS conversion_chars,
           CAST(len(regexp_extract_all(journey, 'E{2,}'))
                AS BIGINT) AS n_error_bursts
    FROM j
    ORDER BY user_id
    """,
)
def behavior_event_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern matching (the MATCH_RECOGNIZE /
    Flink-CEP shape) as one shuffle + vectorized regex: each user's
    timeline becomes a journey string — one character per event, in
    (ts, event_id) order — and sequence patterns become regular
    expressions evaluated JVM-side per user.  Measured here: completed
    conversions ``S[CV]*P`` (signup, any browsing, purchase —
    non-overlapping) with the total characters those funnels span, and
    error bursts ``E{2,}``.  Patterns are restricted to unambiguous
    regexes so leftmost-greedy and leftmost-longest engines provably
    agree (see oracle note).

    100 TB posture: one hash shuffle on user_id (same key the
    sessionizer uses), then per-user state is a bounded string and the
    regex scan is linear — no window re-sort per pattern, and adding a
    pattern is one more column, not another shuffle.  A timeline too
    long for one string would page through
    ``applyInPandasWithState`` — the streaming twin is
    ``stream_transform_with_state``."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    journeys = (
        ev.select("user_id", F.struct("ts", "event_id", "event_type").alias("e"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")),
                    lambda e: F.upper(F.substring(e["event_type"], 1, 1)),
                ),
                "",
            ).alias("journey"),
        )
    )
    conv = r"S[CV]*P"
    return journeys.select(
        "user_id",
        "n_events",
        F.regexp_count("journey", F.lit(conv)).cast("bigint").alias(
            "n_conversions"
        ),
        F.aggregate(
            F.regexp_extract_all("journey", F.lit(conv), F.lit(0)),
            F.lit(0).cast("bigint"),
            lambda acc, m: acc + F.length(m),
        ).alias("conversion_chars"),
        F.regexp_count("journey", F.lit(r"E{2,}")).cast("bigint").alias(
            "n_error_bursts"
        ),
    ).orderBy("user_id")
