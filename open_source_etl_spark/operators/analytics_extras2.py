"""Round-2 batch 4: curriculum phasing, log-space means, nearest as-of
join, Zipf rank-frequency fit, and trade-graph degree distribution.

Provenance GEN/EXT (SURVEY.md §2B): standard analytic families over the
driver fixtures, Spark-first — single-pass grouped aggregation where the
semantics allow, user-keyed windows where ordering is inherent, no
Python anywhere.

Scale posture (100 TB):
- curriculum phasing is deterministic hash/ntile bucketing — one
  window over per-doc scores (swap for percentile_approx thresholds at
  scale, as documented on the RFM operator) plus a hash agg;
- nearest as-of joins ONE union-window pass per direction over the
  user-keyed stream — never a per-event range probe;
- the Zipf fit aggregates token counts (vocabulary-sized frame), ranks
  the top slice, and runs the regression as one grouped pass over
  1000 rows;
- degree distribution reduces the edge list to |nodes| rows before any
  window; log2 binning keeps the output bounded at ~64 rows regardless
  of graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "datapipe_curriculum_phases",
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars,
             ntile(3) OVER (ORDER BY n_chars, doc_id) AS phase,
             doc_id % 8 AS shard
      FROM documents
    )
    SELECT phase, CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM scored
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def datapipe_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training data: documents split into 3
    difficulty phases (short → long, the standard length-as-difficulty
    proxy; swap any quality score in) with deterministic doc_id
    tie-break, then round-robin sharded within each phase so every
    shard sees the same difficulty mix — the layout a curriculum
    training loop consumes phase-by-phase.  The report is per
    (phase, shard) volume, which is also the balance check."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.ntile(3).over(Window.orderBy("n_chars", "doc_id")).alias("phase"),
        (F.col("doc_id") % 8).alias("shard"),
    )
    return (
        scored.groupBy("phase", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("phase", "shard")
    )


@query(
    "agg_logspace_means",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(exp(AVG(ln(l_extendedprice))), 2) AS geometric_mean,
           ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 2) AS harmonic_mean,
           ROUND(AVG(l_extendedprice), 2) AS arithmetic_mean
    FROM lineitem
    WHERE l_extendedprice > 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_logspace_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric and harmonic means via log-/reciprocal-space
    aggregation — the means that survive multiplicative data (growth
    rates, ratios, latencies) where the arithmetic mean misleads, and
    the standard trick for computing them distributed: both reduce to
    a plain SUM/AVG after a per-row transform, so they get map-side
    partial aggregation like any sum (no sorted or windowed pass).
    AM >= GM >= HM by construction — a built-in sanity invariant."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") > 0
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.exp(F.avg(F.log("l_extendedprice"))), 2).alias(
                "geometric_mean"
            ),
            F.round(
                F.count("*") / F.sum(F.lit(1.0) / F.col("l_extendedprice")), 2
            ).alias("harmonic_mean"),
            F.round(F.avg("l_extendedprice"), 2).alias("arithmetic_mean"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events
      WHERE user_id IS NOT NULL AND event_type IN ('error', 'click')
    ), marked AS (
      SELECT *,
        LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS back_ts,
        FIRST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fwd_ts
      FROM e
    )
    SELECT user_id, event_id AS error_event_id,
           CASE WHEN fwd_ts IS NULL THEN back_ts
                WHEN back_ts IS NULL THEN fwd_ts
                WHEN date_diff('microsecond', back_ts, ts)
                     <= date_diff('microsecond', ts, fwd_ts) THEN back_ts
                ELSE fwd_ts END AS nearest_click_ts,
           CAST(FLOOR(LEAST(
             COALESCE(date_diff('microsecond', back_ts, ts), 9223372036854775807),
             COALESCE(date_diff('microsecond', ts, fwd_ts), 9223372036854775807)
           ) / 1000000) AS BIGINT) AS gap_seconds
    FROM marked
    WHERE event_type = 'error' AND (back_ts IS NOT NULL OR fwd_ts IS NOT NULL)
    ORDER BY user_id, error_event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: each error event pairs with the
    closest click by the same user in EITHER time direction (ties break
    backward) — the bidirectional completion of ``join_asof`` (backward
    only), used for telemetry root-causing ("what did the user click
    around this error").

    One union of the two event sets, one user-keyed window pass
    computing the last-preceding and first-following click per row
    (running value each way — O(1) window state), then an in-row
    comparison picks the nearer side.  No range join, no per-event
    probe; the stream is shuffled exactly once on user_id."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isin("error", "click")
    )
    back_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.last(click_ts, ignorenulls=True).over(back_w).alias("back_ts"),
        F.first(click_ts, ignorenulls=True).over(fwd_w).alias("fwd_ts"),
    )
    us = lambda c: F.col(c).cast("timestamp").cast("decimal(26,6)") * 1000000  # noqa: E731
    back_gap = us("ts") - us("back_ts")
    fwd_gap = us("fwd_ts") - us("ts")
    nearest = (
        F.when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(back_gap <= fwd_gap, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
    )
    gap = F.least(
        F.coalesce(back_gap, F.lit(2**63 - 1)),
        F.coalesce(fwd_gap, F.lit(2**63 - 1)),
    )
    return (
        marked.filter(
            (F.col("event_type") == "error")
            & (F.col("back_ts").isNotNull() | F.col("fwd_ts").isNotNull())
        )
        .select(
            "user_id",
            F.col("event_id").alias("error_event_id"),
            nearest.alias("nearest_click_ts"),
            F.floor(gap / 1000000).cast("bigint").alias("gap_seconds"),
        )
        .orderBy("user_id", "error_event_id")
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok
    ), ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rnk
      FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
           ROUND(regr_slope(ln(n), ln(rnk)), 4) AS zipf_slope,
           ROUND(regr_intercept(ln(n), ln(rnk)), 4) AS zipf_intercept,
           ROUND(regr_r2(ln(n), ln(rnk)), 4) AS r2
    FROM ranked
    WHERE rnk <= 1000
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope of
    log(frequency) on log(rank) for the top 1000 tokens — natural text
    lands near -1, and a corpus whose slope drifts is machine-generated,
    templated, or mis-tokenized (a one-row corpus-health screen for
    training-data intake).

    Token counting is the only corpus-sized stage (hash agg on token).
    Ranking runs on the vocabulary frame (already corpus-independent in
    size) and the regression is a single-row aggregate over 1000
    points, computed with the same one-pass regr_* moments as
    ``agg_regression_family``."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    # distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # heaps, no global sort), then the rank window touches only the
    # 1000 survivors; ranking the full vocabulary in a global window
    # would single-partition-sort it
    top = freq.orderBy(F.col("n").desc(), "tok").limit(1000)
    ranked = top.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), "tok"))
        .alias("rnk"),
    )
    ln_n, ln_r = F.log("n"), F.log("rnk")
    return ranked.agg(
        F.count("*").alias("n_ranks"),
        F.round(F.regr_slope(ln_n, ln_r), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_n, ln_r), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(ln_n, ln_r), 4).alias("r2"),
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT cust * 2 AS node FROM pairs
        UNION ALL
        SELECT supp * 2 + 1 AS node FROM pairs
      ) GROUP BY node
    )
    SELECT CAST(FLOOR(ln(degree) / ln(2)) AS BIGINT) AS log2_degree_bin,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(degree) AS BIGINT) AS min_degree,
           CAST(MAX(degree) AS BIGINT) AS max_degree
    FROM deg
    GROUP BY 1
    ORDER BY 1
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-binned degree distribution of the customer–supplier trade
    graph — the first diagnostic run before any iterative graph
    algorithm (PageRank / components), because the max-degree bins
    predict join skew: a hub node's edges all hash to one partition,
    which is exactly what the salting operators exist for.

    Edge dedup + per-node count + ~64-row binning: the output is
    bounded regardless of graph size, and the per-node degree frame is
    the |nodes|-sized intermediate every subsequent algorithm reuses."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    nodes = pairs.select(F.col("cust_node").alias("node")).unionAll(
        pairs.select(F.col("supp_node").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy(
            F.floor(F.log("degree") / F.log(F.lit(2.0)))
            .cast("bigint")
            .alias("log2_degree_bin")
        )
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
        .orderBy("log2_degree_bin")
    )


@query(
    "analytics_period_over_period",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY 1
    )
    SELECT month_start, n_orders, ROUND(revenue, 2) AS revenue,
           ROUND(revenue / LAG(revenue) OVER (ORDER BY month_start) - 1, 6)
             AS mom_growth,
           ROUND(revenue / LAG(revenue, 12) OVER (ORDER BY month_start) - 1, 6)
             AS yoy_growth
    FROM monthly
    ORDER BY month_start
    """,
)
def analytics_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth — the
    first dashboard query every warehouse serves.  The raw stream
    reduces to a |months|-sized frame before any window (the lag runs
    on dozens of rows, so the unpartitioned window is free — the
    opposite trade of the per-user windows elsewhere); revenue sums in
    DECIMAL for order-independent, engine-exact totals."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month_start")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
    w = Window.orderBy("month_start")
    return (
        monthly.select(
            "month_start",
            "n_orders",
            F.round("revenue", 2).alias("revenue"),
            F.round(F.col("revenue") / F.lag("revenue").over(w) - 1, 6).alias(
                "mom_growth"
            ),
            F.round(
                F.col("revenue") / F.lag("revenue", 12).over(w) - 1, 6
            ).alias("yoy_growth"),
        )
        .orderBy("month_start")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS total
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MIN(total) AS DOUBLE) AS total_weight,
           MIN(l_extendedprice) AS weighted_median_price
    FROM cum
    WHERE cumw >= total / 2
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median: the smallest price whose cumulative
    quantity weight reaches half the group's total — the
    inventory-weighted "typical price" plain median misses (a cheap
    high-volume line should pull the median down by its volume, not
    count once).

    The classic distributed formulation: one value-ordered cumulative-
    weight window per group plus the group-total window sharing the same
    shuffle, then the threshold row is a filtered MIN — no per-group
    sort-and-index on the driver, no collect.  Weights and threshold
    stay in exact arithmetic (integer-valued doubles), and the result
    is an actual data value, so cross-engine equality is exact with no
    rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    order = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    cum_w = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(cum_w).alias("cumw"),
        F.sum("l_quantity").over(tot_w).alias("total"),
    )
    return (
        cum.filter(F.col("cumw") >= F.col("total") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min("total").cast("double").alias("total_weight"),
            F.min("l_extendedprice").alias("weighted_median_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "timeseries_gap_fill_locf",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    ),
    obs AS (  -- deterministic outage: day-of-month % 4 = 1 days are lost
      SELECT * FROM daily WHERE dayofmonth(day) % 4 <> 1
    ),
    cal AS (
      SELECT o.event_type,
             unnest(generate_series(o.d0, o.d1, INTERVAL 1 DAY)) AS day
      FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
            FROM obs GROUP BY 1) o
    )
    SELECT c.event_type,
           CAST(c.day AS TIMESTAMP) AS day,
           last_value(o.total_value IGNORE NULLS) OVER (
             PARTITION BY c.event_type ORDER BY c.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS total_value_filled,
           o.total_value IS NOT NULL AS is_observed
    FROM cal c LEFT JOIN obs o
      ON c.event_type = o.event_type AND CAST(c.day AS DATE) = o.day
    ORDER BY c.event_type, day
    """,
)
def timeseries_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with last-observation-carried-forward: rebuild a
    dense daily series from a feed with dropped days (a deterministic
    day-of-month rule simulates the outage so both engines and
    regenerated fixtures replay it), emitting the filled value and an
    is_observed audit flag per day — the repair step dashboards and
    window features need before any day-over-day math is trustworthy.

    The calendar derives per group from sequence(min, max) — |days| rows
    per group, never a driver-side date loop — and the fill is one
    last(ignorenulls) window over the same partition the join already
    shuffled to.  At 100 TB: groups × days stays tiny relative to the
    fact table; the daily pre-aggregation is where the data volume dies."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value")
        )
    )
    obs = daily.filter(F.dayofmonth("day") % 4 != 1)
    cal = (
        obs.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(obs, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            F.last("total_value", ignorenulls=True)
            .over(w)
            .alias("total_value_filled"),
            F.col("total_value").isNotNull().alias("is_observed"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "timeseries_resample_interp",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    ),
    obs AS (  -- same deterministic outage rule as the LOCF query
      SELECT * FROM daily WHERE dayofmonth(day) % 4 <> 1
    ),
    cal AS (
      SELECT o.event_type,
             CAST(unnest(generate_series(o.d0, o.d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
            FROM obs GROUP BY 1) o
    ),
    sp AS (
      SELECT c.event_type, c.day, o.total_value,
             last_value(o.total_value IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN o.total_value IS NOT NULL THEN c.day END
                        IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(o.total_value IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN o.total_value IS NOT NULL THEN c.day END
                         IGNORE NULLS) OVER (
               PARTITION BY c.event_type ORDER BY c.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM cal c LEFT JOIN obs o
        ON c.event_type = o.event_type AND c.day = o.day
    )
    SELECT event_type, CAST(day AS TIMESTAMP) AS day,
           ROUND(CASE WHEN total_value IS NOT NULL THEN total_value
                 ELSE pv + (nv - pv) * CAST(day - pd AS DOUBLE)
                          / CAST(nd - pd AS DOUBLE) END, 6)
             AS value_interp,
           total_value IS NOT NULL AS is_observed
    FROM sp
    ORDER BY event_type, day
    """,
)
def timeseries_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar resample with LINEAR interpolation: the companion to
    timeseries_gap_fill_locf that estimates missing days as the lerp
    between the surrounding observations instead of carrying the last
    one forward — the fill curve ML feature pipelines usually want
    (LOCF introduces staircase bias into day-over-day deltas).

    Same spine-join shape: one |days|-per-group calendar explode, one
    left join, then FOUR ignore-nulls window passes (prev/next value
    and prev/next day) sharing the single event_type partition sort —
    Spark evaluates all four in one Window node, so the physical cost
    equals the LOCF query's.  Endpoints are always observed (the spine
    is bounded by min/max observed day), so the lerp denominator is
    never zero."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value")
        )
    )
    obs = daily.filter(F.dayofmonth("day") % 4 != 1)
    cal = (
        obs.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("total_value").isNotNull(), F.col("day"))
    sp = (
        cal.join(obs, ["event_type", "day"], "left")
        .withColumn("pv", F.last("total_value", ignorenulls=True).over(wb))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("total_value", ignorenulls=True).over(wf))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(wf))
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff("day", "pd").cast("double")
        / F.datediff("nd", "pd").cast("double")
    )
    return sp.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        F.round(
            F.when(F.col("total_value").isNotNull(), F.col("total_value")).otherwise(
                lerp
            ),
            6,
        ).alias("value_interp"),
        F.col("total_value").isNotNull().alias("is_observed"),
    ).orderBy("event_type", "day")
