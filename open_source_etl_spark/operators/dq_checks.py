"""Data-quality checks as oracle-checkable queries.

The library implementation (single-pass suite runner) is
``open_source_etl_spark.dq``; these queries prove the counting semantics
against DuckDB over the fixtures (reference suite: SURVEY.md §2A.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "dq_single_pass_suite",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS status_nulls,
      CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT)
        AS status_out_of_set,
      CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                AND (o_totalprice < 0 OR o_totalprice > 1000000) THEN 1 ELSE 0 END) AS BIGINT)
        AS price_out_of_range,
      CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS date_nulls
    FROM orders
    """,
)
def dq_single_pass_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole expectation suite folded into ONE aggregation pass
    (engine restatement of `data_validator.py:14-39` — the reference runs
    each expectation as its own Snowflake query; here one scan covers
    value-set, range, and not-null checks together)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)).alias("status_nulls"),
        F.sum(
            F.when(
                F.col("o_orderstatus").isNotNull()
                & ~F.col("o_orderstatus").isin("F", "O", "P"),
                1,
            ).otherwise(0)
        ).alias("status_out_of_set"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNotNull()
                & ((F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 1_000_000)),
                1,
            ).otherwise(0)
        ).alias("price_out_of_range"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("date_nulls"),
    )


@query(
    "dq_uniqueness_check",
    oracle="""
    SELECT
      COUNT(*) AS n_keys,
      CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS duplicate_keys,
      MAX(cnt) AS max_multiplicity
    FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS cnt
          FROM lineitem GROUP BY l_orderkey, l_linenumber)
    """,
)
def dq_uniqueness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt `unique` test semantics (`schema.yml:10-21`) on the lineitem
    compound key: duplicate-group count via grouped pre-aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey", "l_linenumber").agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("duplicate_keys"),
        F.max("cnt").alias("max_multiplicity"),
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan detection via anti-joins (GEN of the reference's
    declarative checks to the join graph in FIXTURES.md §B)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # Both orphan counts in ONE lazy plan (1-row aggs cross-joined) — a
    # single job instead of two driver-blocking count() actions, and the
    # two anti-join subtrees run concurrently when the action fires.
    orphan_li = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    orphan_orders = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    return orphan_li.crossJoin(orphan_orders)


@query(
    "dq_outlier_zscore",
    # stddev_samp on both engines is the same sum/sumsq formulation over
    # doubles of modest magnitude; the z-threshold compare is guarded by
    # ROUND on the reported score only, never on the filter boundary
    # (the filter cross-multiplies |x-mean| > 1.6*sd exactly as doubles)
    oracle="""
    WITH stats AS (
      SELECT o_orderstatus,
             AVG(o_totalprice) AS mu,
             STDDEV_SAMP(o_totalprice) AS sd
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           ROUND((o.o_totalprice - s.mu) / s.sd, 4) AS zscore
    FROM orders o JOIN stats s ON o.o_orderstatus = s.o_orderstatus
    WHERE ABS(o.o_totalprice - s.mu) > 1.6 * s.sd
    ORDER BY o_orderkey
    """,
)
def dq_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier detection (the anomaly tier above the
    reference's declarative value checks, GEN of §2A.3): per-group mean and
    stddev computed once, broadcast back, and rows beyond 1.6σ flagged.
    Group stats are a |groups|-sized aggregate, so the enrich join
    broadcasts — the fact table is scanned once and never shuffled."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.groupBy("o_orderstatus").agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sd"),
    )
    return (
        orders.join(F.broadcast(stats), "o_orderstatus")
        .filter(F.abs(F.col("o_totalprice") - F.col("mu")) > 1.6 * F.col("sd"))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.round((F.col("o_totalprice") - F.col("mu")) / F.col("sd"), 4).alias(
                "zscore"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "dq_freshness_check",
    oracle="""
    WITH f AS (
      SELECT
        MAX(CAST(ts AS TIMESTAMP)) AS max_ts,
        COUNT(*) AS n_events,
        COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_active_days
      FROM events
    )
    SELECT
      max_ts,
      n_events,
      n_active_days,
      -- elapsed full hours via explicit FLOOR: DuckDB's // on DOUBLE is
      -- plain division (and CAST AS BIGINT rounds), and date_diff counts
      -- calendar boundaries — both diverge from Spark's long arithmetic.
      -- Spark's long cast truncates the sub-second part first, so floor
      -- the seconds before dividing.
      CAST(FLOOR(FLOOR(epoch(TIMESTAMP '2024-12-31 00:00:00') - FLOOR(epoch(max_ts)))
                 / 3600) AS BIGINT) AS hours_stale,
      FLOOR(FLOOR(epoch(TIMESTAMP '2024-12-31 00:00:00') - FLOOR(epoch(max_ts)))
            / 3600) <= 24 AS is_fresh
    FROM f
    """,
)
def dq_freshness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness check: the latest event timestamp measured against
    a reference point, with a staleness SLA flag — the operational DQ
    tier (is the feed still flowing?) beside the content checks
    (§2A.3), and the batch analogue of the reference's file sensor
    (`dags/…:54-67`: "has new data arrived?").  One global agg: the
    max reduces map-side, a single row crosses the exchange."""
    ev = load_table(spark, sf_dir, "events")
    ref = F.lit("2024-12-31 00:00:00").cast("timestamp")
    f = ev.agg(
        F.max("ts").alias("max_ts"),
        F.count("*").alias("n_events"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_active_days"),
    )
    hours_stale = (ref.cast("long") - F.col("max_ts").cast("long")) / F.lit(3600)
    return f.select(
        "max_ts",
        "n_events",
        "n_active_days",
        F.floor(hours_stale).cast("bigint").alias("hours_stale"),
        (F.floor(hours_stale) <= 24).alias("is_fresh"),
    )


@query(
    "dq_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS m
      FROM orders GROUP BY 1
    ),
    dev AS (
      SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, med.m,
             ABS(o.o_totalprice - med.m) AS adev
      FROM orders o JOIN med ON o.o_orderstatus = med.o_orderstatus
    ),
    mad AS (
      SELECT o_orderstatus, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.o_orderkey, d.o_orderstatus,
           CAST(d.o_totalprice AS DOUBLE) AS o_totalprice,
           ROUND((d.o_totalprice - d.m) / (1.4826 * mad.mad), 4) AS robust_z
    FROM dev d JOIN mad ON d.o_orderstatus = mad.o_orderstatus
    WHERE ABS(d.o_totalprice - d.m) > 1.25 * 1.4826 * mad.mad
    ORDER BY d.o_orderkey
    """,
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag rows
    beyond 1.25 robust-z (MAD scaled by the 1.4826 normal-consistency
    constant; the classic cutoff is 3.5, but the near-uniform fixture
    caps robust-z around 1.35, so the demo threshold flags the real
    distribution tail instead of always returning empty).  Unlike the mean/stddev z-score (dq_outlier_zscore), the
    estimator itself cannot be dragged by the outliers it hunts — the
    robust-statistics tier of the DQ suite.

    Two grouped exact medians (|groups|-sized results broadcast back to
    the fact scan) — at 100 TB swap percentile_approx into the same
    shape.  The flag boundary multiplies doubles identically on both
    engines; ROUND only decorates the reported score."""
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderstatus").agg(
        F.median("o_totalprice").alias("m")
    )
    dev = orders.join(F.broadcast(med), "o_orderstatus").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("m"))
    )
    mad = dev.groupBy("o_orderstatus").agg(F.median("adev").alias("mad"))
    scale = 1.4826
    return (
        dev.join(F.broadcast(mad), "o_orderstatus")
        .filter(F.col("adev") > 1.25 * scale * F.col("mad"))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.round(
                (F.col("o_totalprice") - F.col("m")) / (scale * F.col("mad")), 4
            ).alias("robust_z"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "dq_distribution_drift",
    oracle="""
    WITH binned AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 60000) AS BIGINT), 9) AS bin,
             CASE WHEN CAST(o_orderdate AS TIMESTAMP)
                       < TIMESTAMP '1998-01-01' THEN 'ref' ELSE 'cur' END AS win
      FROM orders
    ), counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
    )
    SELECT bin, n_ref, n_cur,
           ROUND(((n_cur + 1.0) / (t_cur + 10.0) - (n_ref + 1.0) / (t_ref + 10.0))
                 * LN(((n_cur + 1.0) / (t_cur + 10.0))
                      / ((n_ref + 1.0) / (t_ref + 10.0))), 6) AS psi_term
    FROM counts, tot
    ORDER BY bin
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring via the Population Stability Index:
    order values binned into the histogram grid, reference window
    (pre-1998) vs current window (1998+), per-bin PSI term
    (q−p)·ln(q/p) with +1 Laplace smoothing so an empty bin cannot
    produce ln(0).  PSI ≥ 0.2 is the standard retrain/alert threshold —
    summing the returned terms gives the headline score, kept per-bin
    here so the drifted bins are identifiable.

    One single-pass conditional aggregation (both windows counted in the
    same scan — the dq_single_pass_suite pattern), a 10-row result, and
    the totals fold in via a broadcast of one row; cost at 100 TB is one
    scan, one 10-key shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 60000), F.lit(9)).cast("bigint")
    is_ref = F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    counts = (
        orders.select(bin_.alias("bin"), is_ref.alias("is_ref"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10.0)
    q = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10.0)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


@query(
    "dq_anomaly_seasonal",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             dayofweek(CAST(ts AS DATE)) AS dow,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2, 3
    ), scored AS (
      SELECT event_type, day, n,
             AVG(n) OVER (PARTITION BY event_type, dow) AS dow_baseline
      FROM daily
    )
    SELECT event_type, day,
           CAST(n AS BIGINT) AS n_events,
           ROUND(dow_baseline, 6) AS dow_baseline,
           ROUND(n / dow_baseline, 6) AS ratio
    FROM scored
    WHERE n >= 1.5 * dow_baseline
    ORDER BY event_type, day
    """,
)
def dq_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware volume anomaly screen: daily event counts
    compared against the same-day-of-week mean for that event type;
    days at >= 1.5x their weekday baseline are flagged.  The plain
    global-mean z-score (``dq_outlier_zscore``) false-alarms on weekly
    rhythm; conditioning the baseline on day-of-week is the minimal
    seasonal correction.  Shape: one grouped count (|types| x |days|
    rows), then a window over the tiny daily series — the raw stream is
    touched once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.dayofweek(F.col("ts").cast("date")).alias("dow"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type", "dow")
    scored = daily.withColumn("dow_baseline", F.avg("n").over(w))
    return (
        scored.filter(F.col("n") >= 1.5 * F.col("dow_baseline"))
        .select(
            "event_type",
            "day",
            F.col("n").alias("n_events"),
            F.round("dow_baseline", 6).alias("dow_baseline"),
            F.round(F.col("n") / F.col("dow_baseline"), 6).alias("ratio"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "dq_profile_table",
    oracle="""
    WITH w AS (
      SELECT
        COUNT(*) AS n_rows,
        CAST(COUNT(o_orderstatus) AS BIGINT) AS status_nonnull,
        CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
        MIN(o_orderstatus) AS status_min,
        MAX(o_orderstatus) AS status_max,
        CAST(COUNT(o_totalprice) AS BIGINT) AS price_nonnull,
        CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS price_distinct,
        CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS price_min,
        CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS price_max,
        CAST(COUNT(o_orderdate) AS BIGINT) AS date_nonnull,
        CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS date_distinct,
        CAST(MIN(o_orderdate) AS VARCHAR) AS date_min,
        CAST(MAX(o_orderdate) AS VARCHAR) AS date_max
      FROM orders
    )
    SELECT 'o_orderstatus' AS col_name, n_rows,
           status_nonnull AS nonnull_count, status_distinct AS n_distinct,
           status_min AS min_value, status_max AS max_value FROM w
    UNION ALL
    SELECT 'o_totalprice', n_rows, price_nonnull, price_distinct,
           price_min, price_max FROM w
    UNION ALL
    SELECT 'o_orderdate', n_rows, date_nonnull, date_distinct,
           date_min, date_max FROM w
    ORDER BY col_name
    """,
)
def dq_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass EXACT table profile as a driver-checkable query (the
    query-surface twin of ``dq/profile.py``'s library profiler, which
    uses HLL distinct and a driver-side reshape).

    Every statistic for every profiled column is an aggregate expression
    in a single ``agg(...)`` — a 100-column 100 TB table is scanned ONCE
    with map-side partial aggregation, never one job per column (the
    pandas-profiling trap).  The wide 1-row result is unpivoted to long
    form with ``stack`` inside the plan: no collect, no driver loop.

    min/max of the double column are pinned through DECIMAL(18,2) → string
    on both engines so the rendered digits agree (parity.py rule); the
    date column casts to ISO 'YYYY-MM-DD' identically in Spark and DuckDB.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderstatus").alias("status_nonnull"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.min("o_orderstatus").alias("status_min"),
        F.max("o_orderstatus").alias("status_max"),
        F.count("o_totalprice").alias("price_nonnull"),
        F.countDistinct("o_totalprice").alias("price_distinct"),
        F.min(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("price_min"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("price_max"),
        F.count("o_orderdate").alias("date_nonnull"),
        F.countDistinct("o_orderdate").alias("date_distinct"),
        F.min("o_orderdate").cast("string").alias("date_min"),
        F.max("o_orderdate").cast("string").alias("date_max"),
    )
    return wide.selectExpr(
        """stack(3,
             'o_orderstatus', n_rows, status_nonnull, status_distinct,
                              status_min, status_max,
             'o_totalprice',  n_rows, price_nonnull,  price_distinct,
                              price_min, price_max,
             'o_orderdate',   n_rows, date_nonnull,   date_distinct,
                              date_min, date_max)
           AS (col_name, n_rows, nonnull_count, n_distinct,
               min_value, max_value)"""
    ).orderBy("col_name")


@query(
    "dq_cross_field_consistency",
    oracle="""
    SELECT 'documents.n_chars_matches_text' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n_chars IS DISTINCT FROM length(text)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM documents
    UNION ALL
    SELECT 'orders.totalprice_positive',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem.discount_unit_interval',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events.ts_within_epoch',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2000-01-01'
                          OR CAST(ts AS TIMESTAMP) >= TIMESTAMP '2100-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    ORDER BY rule
    """,
)
def dq_cross_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field / cross-column expectations (the GE
    ``expect_column_pair_values...`` tier above the reference's
    single-column suite, SURVEY §2A.3): each rule is a conditional count
    over one table — derived-column consistency (n_chars == length(text)),
    domain bounds (price > 0, discount ∈ [0,1]), and timestamp sanity.

    One aggregation pass per table, map-side partials, outputs pinned to
    BIGINT (the HUGEINT-vs-bigint driver lesson); NULL-robust via
    IS DISTINCT FROM / NULL-skipping comparisons on both engines (NULL
    fields are a missing-value concern — dq_single_pass_suite — not a
    consistency violation)."""
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def rule(df, name, violated):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(violated, 1).otherwise(0)).cast("bigint").alias("n_violations"),
        )

    r1 = rule(
        docs,
        "documents.n_chars_matches_text",
        ~F.col("n_chars").eqNullSafe(F.length("text")),
    )
    r2 = rule(orders, "orders.totalprice_positive", F.col("o_totalprice") <= 0)
    r3 = rule(
        li,
        "lineitem.discount_unit_interval",
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
    )
    ts = F.col("ts").cast("timestamp")
    r4 = rule(
        ev,
        "events.ts_within_epoch",
        (ts < F.lit("2000-01-01").cast("timestamp"))
        | (ts >= F.lit("2100-01-01").cast("timestamp")),
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4).orderBy("rule")
