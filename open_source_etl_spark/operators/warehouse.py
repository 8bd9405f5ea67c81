"""Warehouse maintenance operators: slowly-changing-dimension history
(SCD Type 2) derived from an event stream.

Provenance: GEN (SURVEY.md §2B) — the reference maintains dimension
tables in Snowflake via dbt models; SCD2 versioning is the standard
mechanism an engine replacement must offer for the same job.

Scale notes: the whole derivation is two windows over one
(user_id, ts) shuffle+sort — state-change detection (lag) and validity
intervals (lead) — then a filter.  Partitioning by the entity key keeps
per-partition state bounded; there is no global window and no driver
loop, so the same plan runs at 100 TB with the entity key as the
shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, scoped_view
from ..registry import query


@query(
    "scd2_user_state",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ), marked AS (
      SELECT user_id, event_id, ts, event_type,
        CASE WHEN event_type = LAG(event_type)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
             THEN 0 ELSE 1 END AS is_change
      FROM e
    ), changes AS (
      SELECT user_id, event_id, ts, event_type
      FROM marked WHERE is_change = 1
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS BOOLEAN) AS is_current
    FROM changes
    ORDER BY user_id, valid_from
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 from an event stream: collapse consecutive identical
    states (lag ≠ current marks a change), then lead() closes each
    version's validity interval; the open interval is the current row.
    Both windows share the (user_id, ts, event_id) sort, so Spark plans
    one exchange + one sort for the whole history build."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn(
            "is_change",
            F.when(F.col("event_type") == F.lag("event_type").over(w), 0).otherwise(1),
        )
        .filter(F.col("is_change") == 1)
        .drop("is_change")
    )
    valid_to = F.lead("ts").over(w)
    return (
        changes.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            valid_to.alias("valid_to"),
            valid_to.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


@query(
    "warehouse_recursive_calendar",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01 00:00:00'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01 00:00:00'
    )
    SELECT
      months.m AS month_start,
      COUNT(o.o_orderkey) AS n_orders,
      COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(8,2))) AS DOUBLE), 0.0)
        AS revenue
    FROM months
    LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = months.m
    GROUP BY months.m
    ORDER BY month_start
    """,
)
def warehouse_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): generate the monthly
    calendar dimension spanning the order history, then left-join order
    facts onto it so empty months appear as zero rows — the standard
    gap-free reporting calendar, driven entirely inside the engine (no
    driver-side date loop).

    Scale shape: the recursion materializes |months| rows (tiny, driver-
    independent), the join broadcasts the calendar against the fact scan,
    and months with no orders survive via the LEFT side.  Generalizes
    the reference's run-date partition math (``partitioner.py:7-25``)
    from one date to a generated dimension.
    """
    vord = scoped_view(spark, sf_dir, "orders", "orders")
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01 00:00:00'
        )
        SELECT
          months.m AS month_start,
          COUNT(o.o_orderkey) AS n_orders,
          COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(8,2))) AS DOUBLE),
                   0.0) AS revenue
        FROM months
        LEFT JOIN {vord} o ON date_trunc('month', o.o_orderdate) = months.m
        GROUP BY months.m
        ORDER BY month_start
        """
    )


@query(
    "warehouse_incremental_agg",
    # the oracle aggregates the whole table directly — the incremental
    # base+delta merge must be indistinguishable from a full rescan
    oracle="""
    SELECT
      o_orderstatus,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
      ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*), 4)
        AS avg_price,
      MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def warehouse_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh):
    a pre-aggregated BASE (orders before the cutoff) is merged with the
    newly-arrived DELTA's partial aggregates — re-aggregating sums of
    sums and sums of counts — instead of rescanning the base table.
    AVG is derived from merged (sum, count), never averaged averages;
    MIN/MAX merge by MIN/MAX.  This is the partial-aggregate algebra
    Spark applies inside one job, applied ACROSS jobs: at 100 TB the
    base rollup is thousands of times the delta, and the refresh cost
    becomes O(delta + |groups|).

    The oracle aggregates the full table in one pass — the merge is only
    correct if it is indistinguishable from the rescan.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(8,2)")).alias("revenue_dec"),
            F.max("o_orderdate").alias("last_order"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_dec").alias("revenue_dec"),
            F.max("last_order").alias("last_order"),
        )
    )
    return merged.select(
        "o_orderstatus",
        "n_orders",
        F.col("revenue_dec").cast("double").alias("revenue"),
        F.round(
            F.col("revenue_dec").cast("double") / F.col("n_orders"), 4
        ).alias("avg_price"),
        "last_order",
    ).orderBy("o_orderstatus")


@query(
    "model_pipeline_build",
    oracle="""
    WITH stg_orders AS (
      SELECT o_orderkey AS order_key, o_custkey AS cust_key,
             o_orderstatus AS status, o_totalprice AS totalprice
      FROM orders
    ),
    stg_customers AS (
      SELECT c_custkey AS cust_key, c_mktsegment AS segment FROM customer
    )
    SELECT
      c.segment,
      o.status,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o.totalprice AS DECIMAL(8,2))) AS DOUBLE) AS revenue
    FROM stg_orders o
    JOIN stg_customers c ON o.cust_key = c.cust_key
    GROUP BY c.segment, o.status
    ORDER BY segment, status
    """,
)
def model_pipeline_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-analogue model layer as a t2 query: a 3-model ref() DAG
    (two staging views -> one fact table) built in dependency order by
    the ModelRegistry, with the reference's schema tests (unique /
    not_null, `schema.yml:8-21`) asserted on the staging models before
    the fact is returned.  This is §2A.2 run end-to-end — model
    registration, topological build, view/table materialization, tests —
    not just the library unit tests (tests/test_models.py).
    """
    from ..models import ModelRegistry

    reg = ModelRegistry()
    reg.register(
        "stg_orders_q",
        lambda s, ref: load_table(s, sf_dir, "orders").select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("totalprice"),
        ),
        materialized="view",
        tests={"unique": ("order_key",), "not_null": ("order_key", "cust_key")},
    )
    reg.register(
        "stg_customers_q",
        lambda s, ref: load_table(s, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_mktsegment").alias("segment"),
        ),
        materialized="view",
        tests={"unique": ("cust_key",), "not_null": ("cust_key",)},
    )
    reg.register(
        "fct_revenue_by_segment_q",
        lambda s, ref: (
            ref("stg_orders_q")
            .join(ref("stg_customers_q"), "cust_key")
            .groupBy("segment", "status")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("totalprice").cast("decimal(8,2)"))
                .cast("double")
                .alias("revenue"),
            )
        ),
        materialized="table",
        depends_on=("stg_orders_q", "stg_customers_q"),
    )
    built = reg.build(spark)
    outcomes = reg.test(spark)
    failed = [k for k, ok in outcomes.items() if not ok]
    if failed:  # schema tests gate the model output, as in dbt
        raise AssertionError(f"model schema tests failed: {failed}")
    return built["fct_revenue_by_segment_q"].orderBy("segment", "status")


@query(
    "warehouse_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY user_id, event_type
    ), b AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY user_id, event_type
    )
    SELECT
      -- unmatched-side detection MUST use the aggregate (a.n/b.n), not the
      -- key columns: a genuinely-NULL user_id key would misclassify as
      -- added/removed (caught by the perturbed-fixture sweep)
      CASE WHEN a.n IS NULL THEN 'added'
           WHEN b.n IS NULL THEN 'removed'
           WHEN a.n <> b.n THEN 'changed'
           ELSE 'unchanged' END AS change_type,
      CAST(COUNT(*) AS BIGINT) AS n_keys,
      CAST(SUM(COALESCE(b.n, 0) - COALESCE(a.n, 0)) AS BIGINT) AS net_delta
    FROM a FULL OUTER JOIN b
      ON a.user_id = b.user_id AND a.event_type = b.event_type
    GROUP BY 1
    ORDER BY change_type
    """,
)
def warehouse_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the data-diff behind incremental-load
    audits): aggregate two time slices of the event stream to the same
    grain, FULL OUTER join on the key, and classify every key as
    added / removed / changed / unchanged with the net row delta.

    Both slices aggregate BEFORE the join, so the join carries one row
    per key per side, never raw events; at 100 TB the two grouped
    aggregations and the join all hash-partition on the same key — with
    AQE the exchanges coalesce, and the diff output is bounded by key
    cardinality.  GEN of the reference's load-verification sensor
    (`dags/ingest_bundesliga_match_scores.py:54-67` checks presence only;
    this checks content).
    """
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    grain = lambda df: df.groupBy("user_id", "event_type").agg(  # noqa: E731
        F.count("*").cast("bigint").alias("n")
    )
    a = grain(ev.filter(F.col("ts") < cut)).withColumnsRenamed({"n": "n_a"})
    b = grain(ev.filter(F.col("ts") >= cut)).withColumnsRenamed({"n": "n_b"})
    joined = a.join(b, ["user_id", "event_type"], "full_outer")
    change = (
        F.when(F.col("n_a").isNull(), "added")
        .when(F.col("n_b").isNull(), "removed")
        .when(F.col("n_a") != F.col("n_b"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            change.alias("change_type"),
            (F.coalesce("n_b", F.lit(0)) - F.coalesce("n_a", F.lit(0))).alias("delta"),
        )
        .groupBy("change_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("delta").cast("bigint").alias("net_delta"),
        )
        .orderBy("change_type")
    )


@query(
    "warehouse_point_in_time_join",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      FROM events WHERE user_id IS NOT NULL
    ), marked AS (
      SELECT user_id, event_id, ts, event_type,
        CASE WHEN event_type = LAG(event_type)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
             THEN 0 ELSE 1 END AS is_change
      FROM e WHERE event_type <> 'purchase'
    ), dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM marked WHERE is_change = 1
    )
    SELECT d.state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(f.value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS total_value
    FROM e f
    JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (f.ts < d.valid_to OR d.valid_to IS NULL)
    WHERE f.event_type = 'purchase'
    GROUP BY d.state
    ORDER BY d.state
    """,
)
def warehouse_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: facts (purchases) against the SCD2
    dimension version valid at fact time — the standard consumption
    pattern for the history ``scd2_user_state`` builds, and the
    correctness backbone of ML feature stores (no future leakage: a fact
    only ever sees dimension state with ``valid_from <= ts``).

    Physical shape: equi-join on the entity key with the interval
    predicate as a residual filter — a sort-merge join partitioned by
    user_id whose per-key version list is bounded (consecutive-dedup
    keeps one row per state change), so the residual scan per fact is
    short.  When the version count per key grows unbounded, the engine
    switches to the union-and-last-value ASOF form
    (``behavior_attribution_last_touch``) which is one window pass;
    both are registered so the planner choice is explicit."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    nonp = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        nonp.withColumn(
            "is_change",
            F.when(F.col("event_type") == F.lag("event_type").over(w), 0).otherwise(1),
        )
        .filter(F.col("is_change") == 1)
        .select(
            F.col("user_id").alias("d_user_id"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = facts.join(
        dim,
        (facts.user_id == dim.d_user_id)
        & (facts.ts >= dim.valid_from)
        & ((facts.ts < dim.valid_to) | dim.valid_to.isNull()),
    )
    return (
        joined.groupBy("state")
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value"),
        )
        .orderBy("state")
    )


@query(
    "warehouse_merge_upsert",
    oracle="""
    WITH chg AS (
      SELECT c_custkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE) AS c_acctbal,
             'U' AS op
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal, 'D' AS op
      FROM customer WHERE c_custkey % 7 = 3
      UNION ALL
      SELECT c_custkey + 10000000, 'NEW', CAST(100.0 AS DOUBLE), 'I' AS op
      FROM customer WHERE c_custkey % 101 = 0
    ),
    merged AS (
      SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment
                  ELSE t.c_mktsegment END AS c_mktsegment,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                  ELSE t.c_acctbal END AS c_acctbal
      FROM (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer) t
      FULL OUTER JOIN chg s ON t.c_custkey = s.c_custkey
      WHERE COALESCE(s.op, '') <> 'D'
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM merged
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def warehouse_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE INTO as a driver-checkable query: a deterministic
    changes feed (updates for custkey%7=0, deletes for %7=3, inserts of
    brand-new keys for %101=0) applied to a parquet customer snapshot via
    ``sources.merge.merge_into`` (one key-partitioned full-outer join +
    atomic staging swap — the Snowflake-side MERGE of SURVEY §2A.2 #13-14
    without a warehouse), then the post-merge per-segment balance totals.

    Scale: the merge shuffles once on the merge key and the rewrite is a
    straight distributed parquet write; no driver-side row handling.  The
    balance update (+100) runs in exact DECIMAL so the post-merge sum is
    order-independent on both engines (functions/parity.py contract).
    """
    import tempfile as _tf

    from ..functions.parity import dsum
    from ..sources.merge import merge_into

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    workdir = _tf.mkdtemp(prefix="osetl-merge-q-")
    target_path = f"{workdir}/customer_snapshot"
    cust.write.mode("overwrite").parquet(target_path)

    updates = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal").cast("decimal(18,2)") + F.lit(100))
        .cast("double")
        .alias("c_acctbal"),
        F.lit("U").alias("op"),
    )
    deletes = cust.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey", "c_mktsegment", "c_acctbal", F.lit("D").alias("op")
    )
    inserts = cust.filter(F.col("c_custkey") % 101 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(100.0).alias("c_acctbal"),
        F.lit("I").alias("op"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)

    merged = merge_into(
        spark,
        target_path,
        changes,
        ["c_custkey"],
        when_matched_delete=F.col("__src_op") == "D",
    )
    from ._localize import localize

    return localize(
        merged.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_mktsegment"),
        workdir,
    )
