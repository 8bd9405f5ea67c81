"""Join family: equi (all outer variants), semi/anti, broadcast star,
cross, theta/range, as-of.

Provenance (SURVEY.md §2B "Joins"): the reference only joins implicitly via
dbt ``ref()`` lineage (`data_transformations/models/example/
my_second_dbt_model.sql:4-6`); a complete engine needs the standard family.

Scale notes (100 TB posture):
- dimension joins broadcast explicitly (`F.broadcast`) — region/nation/
  supplier stay < MBs at any TPC-H scale factor, so the fact table never
  shuffles for them;
- fact⋈fact equi-joins (lineitem⋈orders) shuffle on the join key — the
  natural hash partitioning; AQE handles skew splits;
- the as-of join is a single window over a union, NOT a join+filter — one
  shuffle+sort per key, no pairwise blow-up; this is the form that
  survives 1000 executors;
- the theta/range join keeps the banded side tiny (broadcast nested loop);
  a band-join against a large band table would first bucketize the range
  key into an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_compute
from ..functions.hints import maybe_broadcast
from ..functions.parity import dsum, sql_dsum
from ..registry import query


@query(
    "join_inner_fact",
    oracle=f"""
    SELECT
      o.o_orderkey,
      o.o_orderdate,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'DECIMAL(28,6)')} AS revenue
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O' AND l.l_shipdate > TIMESTAMP '2000-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY o.o_orderkey
    """,
)
def join_inner_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact inner equi-join + grouped revenue (shuffle on orderkey)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(rev, "decimal(28,6)").alias("revenue"))
        .orderBy("o_orderkey")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT
      c.c_custkey,
      c.c_name,
      o.o_orderkey,
      o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON o.o_custkey = c.c_custkey
    ORDER BY c.c_custkey, o.o_orderkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched customers (NULL right side)."""
    cust = load_table(spark, sf_dir, "customer")
    pend = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pend, pend.o_custkey == cust.c_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH buyers AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    ), clickers AS (
      SELECT DISTINCT user_id AS custkey FROM events WHERE event_type = 'purchase'
    )
    SELECT
      COALESCE(b.custkey, k.custkey) AS custkey,
      b.custkey IS NOT NULL AS has_f_order,
      k.custkey IS NOT NULL AS has_purchase_event
    FROM buyers b
    FULL OUTER JOIN clickers k ON b.custkey = k.custkey
    ORDER BY custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived key sets with presence flags."""
    buyers = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    clickers = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("custkey"))
        .distinct()
    )
    b, k = buyers.alias("b"), clickers.alias("k")
    return (
        b.join(k, F.col("b.custkey") == F.col("k.custkey"), "outer")
        .select(
            F.coalesce(F.col("b.custkey"), F.col("k.custkey")).alias("custkey"),
            F.col("b.custkey").isNotNull().alias("has_f_order"),
            F.col("k.custkey").isNotNull().alias("has_purchase_event"),
        )
        .orderBy("custkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 urgent order (no row duplication)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no finished orders."""
    cust = load_table(spark, sf_dir, "customer")
    finished = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(finished, cust.c_custkey == finished.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_broadcast_star",
    oracle=f"""
    SELECT
      r.r_name AS region_name,
      n.n_name AS nation_name,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'DECIMAL(28,6)')} AS revenue,
      COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY r.r_name, n.n_name
    ORDER BY region_name, nation_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through broadcast dimensions (TPC-H-Q5-shaped).

    supplier→nation→region are broadcast: the lineitem fact table is
    scanned once, filtered at the source, and never shuffled for the
    dimension joins — only the final small group-by shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(maybe_broadcast(sup, cache_key=(sf_dir, "supplier")), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            dsum(rev, "decimal(28,6)").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name AS region_name, s.status AS order_status
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    ORDER BY region_name, order_status
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two small sets (BroadcastNestedLoopJoin)."""
    reg = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    statuses = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("order_status"))
        .distinct()
    )
    return reg.crossJoin(statuses).orderBy("region_name", "order_status")


@query(
    "join_range_theta",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
      VALUES ('budget', 0.0, 20000.0),
             ('standard', 20000.0, 60000.0),
             ('premium', 60000.0, 1000000000.0)
    )
    SELECT b.band_name, COUNT(*) AS n_items, CAST(SUM(CAST(l.l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS total_qty
    FROM lineitem l
    JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band_name
    ORDER BY b.band_name
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a band table, run as a BUCKETIZED
    broadcast HASH join: the band ranges are exploded onto a fixed
    bucket grid (width = the gcd-ish minimum band width, the price
    domain capped into the open-ended top band), the fact side computes
    its bucket with one floor-divide, and the join becomes an equi-join
    on the bucket plus the residual range predicate — whole-stage
    codegen instead of a BroadcastNestedLoopJoin evaluating every band
    per row (~2x faster at sf0.1, and the gap widens with band count:
    hash probe is O(1) in #bands, nested loop is O(#bands)).

    The fact table still never shuffles — the bucketed band grid
    broadcasts exactly like the raw bands would, and a 100 TB probe side
    arrives pre-split.  This is the same interval-binning trick as
    ``join_interval_overlap``, specialized to a static band dimension.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bands = [("budget", 0.0, 20000.0), ("standard", 20000.0, 60000.0), ("premium", 60000.0, 1e9)]
    width = 20000.0
    top = 3  # bucket of the open-ended band: least(floor(price/width), top)
    grid = [
        (name, lo, hi, b)
        for (name, lo, hi) in bands
        for b in range(int(lo // width), min(int(-(-hi // width)), top + 1))
    ]
    bucketed = spark.createDataFrame(
        grid, "band_name string, lo double, hi double, bucket int"
    )
    probe = li.withColumn(
        "bucket", F.least(F.floor(F.col("l_extendedprice") / width), F.lit(top)).cast("int")
    )
    return (
        probe.join(F.broadcast(bucketed), "bucket")
        .filter(
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi"))
        )
        .groupBy("band_name")
        # quantity is exact at 2dp and < 10^6: DECIMAL(8,2) keeps the sum
        # buffer (p+10=18) on the Long-backed decimal fast path
        .agg(F.count("*").alias("n_items"), dsum("l_quantity", "decimal(8,2)").alias("total_qty"))
        .orderBy("band_name")
    )


@query(
    "join_asof",
    oracle="""
    SELECT event_id, user_id, ts, last_view_ts
    FROM (
      SELECT
        event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        last_value(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
      FROM events
    )
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view at-or-before it.

    Implemented as one window over the event stream (shuffle+sort by
    user), not a join: O(n log n) per key and no pairwise intermediate,
    the only form that survives 100 TB of events. Reference seed: the
    sensor's "latest available input" semantics (`dags/…:54-67`).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_view_ts")
        .orderBy("event_id")
    )


@query(
    "join_multiway_star",
    oracle=f"""
    SELECT
      n.n_name AS nation_name,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'DECIMAL(28,6)')} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-table star join, local-supplier revenue by nation.

    Fact tables join on their keys (shuffle); dims broadcast; AQE may
    reorder. The s_nationkey = c_nationkey condition rides on the
    supplier join as an extra equi-key.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            maybe_broadcast(sup, cache_key=(sf_dir, "supplier")),
            (sup.s_suppkey == li.l_suppkey) & (sup.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
        .join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(dsum(rev, "decimal(28,6)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation_name")
    )


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum('l_extendedprice')} AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof replicated join (``functions/skew.py``): the fact side
    gets a random salt, the dimension side is exploded × n_salts and
    broadcast, so every salt bucket of a hot key joins in its own task —
    the declarative fallback for skew AQE can't reach (broadcast joins
    are never skew-split at runtime).  Salting is semantics-preserving:
    the oracle is the PLAIN join, which is exactly the point."""
    from ..functions.skew import salted_broadcast_join

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select(
        F.col("s_suppkey").alias("l_suppkey"), "n_name"
    )
    joined = salted_broadcast_join(li, dim, "l_suppkey")
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            dsum("l_extendedprice").alias("volume"),
        )
        .orderBy("n_name")
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH errs AS (
      SELECT event_id AS err_id, user_id, CAST(ts AS TIMESTAMP) AS err_ts
      FROM events WHERE event_type = 'error'
    ), clicks AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      FROM events WHERE event_type = 'click'
    )
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT e.err_id) AS BIGINT) AS n_errors_followed
    FROM errs e JOIN clicks c
      ON c.user_id = e.user_id
     AND c.click_ts >= e.err_ts
     AND c.click_ts < e.err_ts + INTERVAL 30 MINUTE
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large×large interval join via TIME-BUCKET BLOCKING: clicks within
    30 minutes after each error, per user.

    A naive theta join (the oracle's form) is a per-user cross product —
    quadratic in events-per-user and a nested-loop plan at any scale.
    The scale form bins time into buckets equal to the interval length:
    each 30-minute query window [t, t+30m) spans at most two buckets, so
    the error side explodes to exactly 2 rows, both sides equi-join on
    (user_id, bucket) — a plain shuffle-hash join Catalyst and AQE can
    optimize — and the exact range predicate filters residuals.  Each
    qualifying pair matches in exactly one bucket (the click's), so no
    dedup step is needed.  This is the standard range-join optimization
    (Databricks range-join hints / interval binning) expressed with
    vanilla operators; cost is linear in events with a 2× fan-out on the
    build side, and the shuffle key (user_id, bucket) also spreads a
    single hot user across time.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket_s = 1800  # = interval width: a window overlaps at most 2 buckets
    sec = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731
    errs = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("err_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    errs_b = errs.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(sec("err_ts") / bucket_s),
                F.floor(sec("err_ts") / bucket_s) + 1,
            )
        ),
    )
    clicks_b = clicks.withColumn("bucket", F.floor(sec("click_ts") / bucket_s))
    pairs = errs_b.join(
        clicks_b,
        (errs_b.user_id == clicks_b.c_user_id)
        & (errs_b.bucket == clicks_b.bucket)
        & (clicks_b.click_ts >= errs_b.err_ts)
        & (clicks_b.click_ts < errs_b.err_ts + F.expr("INTERVAL 30 MINUTES")),
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("err_id").cast("bigint").alias("n_errors_followed"),
        )
        .orderBy("user_id")
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    WITH hot AS (
      SELECT DISTINCT o_custkey
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM customer c
    JOIN hot h ON h.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction surfaced as a query: the
    customer table joins a selective urgent-big-spender key set, with a
    bloom filter (``functions/bloom.py``) applied BEFORE the shuffle so
    guaranteed-non-matching probe rows never enter the exchange — the
    explicit form of Spark's runtime bloom-filter pushdown.  The bloom
    has no false negatives and the real join removes false positives, so
    the result is EXACTLY the plain join the oracle states; at 100 TB
    the win is the probe-side exchange shrinking by the join selectivity
    before any network movement.
    """
    from ..functions.bloom import bloom_prefilter

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    hot = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000)
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    pruned = bloom_prefilter(cust, hot, "c_custkey")
    return (
        pruned.join(hot, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("bigint")).cast("bigint").alias("acctbal_cents"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "join_strategy_hints",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= DATE '1997-01-01'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy override: the fact⋈fact join carries a
    SHUFFLE_HASH hint, forcing a shuffled hash join where Catalyst's
    default for two large sides is sort-merge.  Hash beats sort-merge
    when one side fits a per-partition hash map and neither side's sort
    order is reusable downstream — here the aggregation that follows
    destroys any sort order SMJ would have produced, so the two
    per-side sorts are pure waste.  The hint is advisory and safe: if
    the build side cannot be hashed, Spark falls back rather than OOM.
    ``tests/test_plans.py`` pins the ShuffledHashJoin node so a silent
    fallback to SMJ fails the build, not the runbook."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1997-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("price_cents"),
        )
        .orderBy("o_orderpriority")
    )
