"""Window-function family: ranking, analytic (lag/lead/first/last),
running and moving frames, range frames.

Provenance: GEN (SURVEY.md §2B "Window functions") — the reference has no
windows; they're the standard analytic surface any engine replacement
needs.

Scale notes: a window = one shuffle on partitionBy + per-partition sort.
Every window below partitions on a real key (customer, supplier, user) so
state per partition stays bounded; none uses a global (empty-partition)
window, which would serialize the world onto one task at 100 TB.
Deterministic tie-breaks (orderBy includes a unique key) keep results
reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT
        c.c_custkey, o.o_orderkey, o.o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                           ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number over (partition, order, tiebreak)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@query(
    "window_rank_family",
    oracle="""
    SELECT
      s_suppkey,
      n_items,
      RANK() OVER (ORDER BY n_items DESC, s_suppkey) AS item_rank,
      DENSE_RANK() OVER (ORDER BY n_items DESC, s_suppkey) AS item_dense_rank,
      NTILE(4) OVER (ORDER BY n_items DESC, s_suppkey) AS quartile
    FROM (
      SELECT l_suppkey AS s_suppkey, COUNT(*) AS n_items
      FROM lineitem GROUP BY l_suppkey
    )
    ORDER BY item_rank
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over an aggregated input.

    The window is global but its input is pre-aggregated to one row per
    supplier — bounded cardinality, so a single-partition sort is fine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count("*").alias("n_items")
    )
    w = Window.orderBy(F.col("n_items").desc(), "s_suppkey")
    return (
        per_supp.select(
            "s_suppkey",
            "n_items",
            F.rank().over(w).alias("item_rank"),
            F.dense_rank().over(w).alias("item_dense_rank"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("item_rank")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
      date_diff('day',
                CAST(lag(o_orderdate) OVER w AS DATE),
                CAST(o_orderdate AS DATE)) AS days_since_prev,
      lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each customer's order sequence (inter-arrival days)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            # date→timestamp: bare DATE outputs diverge through the driver's
            # pandas canonicalizer (datetime.date vs datetime64)
            F.col("o_orderdate").cast("date").cast("timestamp").alias("order_date"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag("o_orderdate").over(w).cast("date"),
            ).alias("days_since_prev"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
        )
        .orderBy("o_custkey", "order_date", "o_orderkey")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_spend,
      ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        AS order_seq
    FROM orders
    ORDER BY o_custkey, order_seq
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer — unbounded-preceding frame.

    The sum runs in decimal so every prefix is exact and order-stable
    across engines (see functions/parity.py).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .over(frame)
            .cast("double")
            .alias("running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT
      user_id,
      event_id,
      ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
        AS moving_avg_3
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event values per user (bounded rows frame)."""
    ev = load_table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).over(frame).cast("double")
                / F.count("*").over(frame),
                4,
            ).alias("moving_avg_3"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT
      p_partkey,
      p_retailprice,
      COUNT(*) OVER (ORDER BY p_retailprice
                     RANGE BETWEEN 50.0 PRECEDING AND 50.0 FOLLOWING)
        AS n_similar_priced
    FROM part
    ORDER BY p_partkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: parts within ±50 of each retail price.

    PySpark's Window.rangeBetween only accepts integral offsets, so the
    fractional frame goes through the SQL expression surface (same plan).
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.selectExpr(
            "p_partkey",
            "p_retailprice",
            "count(*) OVER (ORDER BY p_retailprice RANGE BETWEEN 50.0 PRECEDING AND 50.0 FOLLOWING)"
            " AS n_similar_priced",
        )
        .orderBy("p_partkey")
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT
      o_custkey,
      first_value(o_orderkey) OVER w AS first_orderkey,
      last_value(o_orderkey)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS last_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last order per customer via unbounded frames + distinct."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            F.last("o_orderkey").over(full).alias("last_orderkey"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      ROUND(percent_rank() OVER w, 6) AS pr,
      ROUND(cume_dist() OVER w, 6) AS cd,
      nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value per customer ordered by price (ties broken by key so both
    engines rank identically)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_running_distinct",
    oracle="""
    WITH du AS (
      -- user_id IS NOT NULL keeps day_users consistent with COUNT DISTINCT
      -- (which skips NULLs) even if a future fixture drop has NULL users
      SELECT DISTINCT event_type,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             user_id
      FROM events
      WHERE user_id IS NOT NULL
    ),
    per_day AS (
      SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS day_users
      FROM du GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day,
             CAST(COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY day) AS BIGINT) AS cum_users,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY user_id) AS rn
      FROM du
    )
    SELECT p.event_type, CAST(p.day AS TIMESTAMP) AS day, p.day_users, c.cum_users
    FROM per_day p
    JOIN cum c ON p.event_type = c.event_type AND p.day = c.day AND c.rn = 1
    ORDER BY p.event_type, p.day
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window (cumulative unique users per
    event type by day) — EXACT, with no distinct sets in window state.

    Spark has no COUNT(DISTINCT) OVER; the naive idiom
    size(array_distinct(flatten(collect_list(collect_set(u)) over w)))
    materializes every user the event_type has ever seen inside the final
    row's frame: O(days x |users|) memory in one task at 100 TB.  The
    scale-safe exact identity instead: a user is counted the first day
    they appear, so cumulative-distinct(day) = running SUM of
    first-occurrence counts.  One groupBy(event_type, user) for min(day),
    one groupBy(event_type, day) for the new-user counts, then a running
    sum over the |days|-sized aggregate — every shuffle carries scalar
    counts, never user sets.  (An HLL companion for the approximate path
    is window_running_distinct_approx.)  The oracle uses DuckDB's native
    COUNT(DISTINCT) OVER, deduplicated to one row per (type, day)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.where(F.col("user_id").isNotNull()).select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    per_day = daily.groupBy("event_type", "day").agg(
        F.countDistinct("user_id").alias("day_users")
    )
    new_per_day = (
        daily.groupBy("event_type", "user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        per_day.join(new_per_day, ["event_type", "day"], "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("cum_users", F.sum("new_users").over(w).cast("bigint"))
    )
    return cum.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        "day_users",
        "cum_users",
    ).orderBy("event_type", "day")


@query(
    "window_running_distinct_approx",
    # the HLL estimate itself is sketch-specific; the value-checked
    # surface is the exact per-day / cumulative twins plus a 3-sigma
    # bound pin on every cumulative estimate (lgK=14 => RSE ~0.81%,
    # flag at 3%, integer arithmetic)
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             user_id
      FROM events
      WHERE user_id IS NOT NULL
    ),
    per_day AS (
      SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS day_users
      FROM du GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day,
             CAST(COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY day) AS BIGINT) AS cum_users,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY user_id) AS rn
      FROM du
    )
    SELECT p.event_type, CAST(p.day AS TIMESTAMP) AS day, p.day_users,
           c.cum_users, TRUE AS hll_within_3pct
    FROM per_day p
    JOIN cum c ON p.event_type = c.event_type AND p.day = c.day AND c.rn = 1
    ORDER BY p.event_type, p.day
    """,
)
def window_running_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate running distinct-user count via HLL sketches merged
    along the window frame — the documented 100 TB path when even the
    first-occurrence exact rewrite (window_running_distinct) is too much
    state (e.g. the (event_type, user) key space itself won't shuffle
    cheaply).  One fixed-size sketch per (event_type, day) from a single
    groupBy pass, then hll_union_agg over the cumulative frame: window
    state is |days| x 1 KB sketches per partition, independent of user
    cardinality.

    Driver pin: the exact cumulative twin (the first-occurrence
    running-sum rewrite from window_running_distinct) joins back on
    (event_type, day) and ``hll_within_3pct`` bounds every cumulative
    estimate at 3x the lgK=14 relative standard error in integer
    arithmetic — a broken register merge along the frame flips the flag
    on every later day.  At 100 TB the exact twin is exactly the state
    this operator exists to avoid; it rides here for verification only
    (tests/test_sketch_quality.py keeps the tighter relative-error pin).
    """
    raw = running_distinct_approx_raw(load_table(spark, sf_dir, "events"))
    return raw.select(
        "event_type",
        "day",
        "day_users",
        "cum_users",
        (
            F.abs(F.col("cum_users_approx") - F.col("cum_users")) * 100
            <= F.col("cum_users") * 3
        ).alias("hll_within_3pct"),
    ).orderBy("event_type", "day")


def running_distinct_approx_raw(ev: DataFrame) -> DataFrame:
    """HLL cumulative estimates next to the exact first-occurrence
    running sum, per (event_type, day) — the registry query projects
    the 3% bound flag; the tighter 6-sigma relative-error pin in
    tests/test_sketch_quality.py reads the raw estimates."""
    daily = ev.where(F.col("user_id").isNotNull()).select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    per_day = daily.groupBy("event_type", "day").agg(
        F.countDistinct("user_id").alias("day_users"),
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"),
    )
    new_per_day = (
        daily.groupBy("event_type", "user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_day.join(new_per_day, ["event_type", "day"], "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("cum_users", F.sum("new_users").over(w).cast("bigint"))
        .withColumn(
            "cum_users_approx",
            F.hll_sketch_estimate(F.hll_union_agg("sketch").over(w)).cast("bigint"),
        )
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "day_users",
            "cum_users",
            "cum_users_approx",
        )
    )


@query(
    "window_pareto_share",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(8,2))) AS DOUBLE) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT segment, revenue,
           ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, segment)
                 / SUM(revenue) OVER (), 6) AS cum_share
    FROM seg
    ORDER BY revenue DESC, segment
    """,
)
def window_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / cumulative-share analysis: segments ranked by revenue
    with their running share of the total (the 80/20 cut is where
    cum_share crosses 0.8).  Two window passes over a |groups|-sized
    aggregate — the fact table contributes only the initial rollup.
    No forced broadcast: customer scales with the data (huge at 100 TB),
    so AQE picks the join strategy at runtime from actual sizes.
    The share divides two exact decimal-interior doubles, so ROUND(…, 6)
    decorates an identical quotient on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(8,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w_run = Window.orderBy(F.col("revenue").desc(), "segment").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return seg.select(
        "segment",
        "revenue",
        F.round(F.sum("revenue").over(w_run) / F.sum("revenue").over(w_all), 6).alias(
            "cum_share"
        ),
    ).orderBy(F.col("revenue").desc(), "segment")
