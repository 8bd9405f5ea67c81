"""Relational-surface extensions (GEN, SURVEY.md §2B): right outer join,
pivot/unpivot, exact interpolated percentiles, and correlated subquery
shapes (EXISTS / scalar subquery).

Catalyst decorrelates the subqueries into joins (SURVEY.md §4 "subquery
decorrelation" — zero custom code); pivot compiles to a single grouped
aggregation with conditional sums, not N passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, scoped_view
from ..registry import query

_STATUSES = ("F", "O", "P")


@query(
    "join_right_outer",
    oracle="""
    SELECT
      o.o_orderkey,
      o.o_orderstatus,
      c.c_custkey,
      c.c_name
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
      AND o.o_totalprice > 400000
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer equi-join with a join-side predicate: every customer
    survives, orders only above the price floor (the predicate lives in
    the ON clause, NOT a WHERE — pushed to the left side pre-join)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            cust,
            (orders.o_custkey == cust.c_custkey) & (orders.o_totalprice > 400_000),
            "right",
        )
        .select("o_orderkey", "o_orderstatus", "c_custkey", "c_name")
        .orderBy(
            F.col("c_custkey").asc_nulls_first(), F.col("o_orderkey").asc_nulls_first()
        )
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
      COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
      COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × status.  The pivot values are
    declared explicitly — at scale, letting Spark *discover* pivot values
    costs an extra distinct scan and an unbounded column blowup."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .count()
        .orderBy("o_orderpriority")
    )
    # empty cells: Spark pivot-count yields NULL, SQL conditional COUNT
    # yields 0 — normalize to 0 (also what a report consumer wants)
    return out.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"status_{s}")
            for s in _STATUSES
        ],
    )


@query(
    "unpivot_status_counts",
    oracle="""
    WITH wide AS (
      SELECT
        o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n_orders
    FROM wide
    UNPIVOT (n_orders FOR status IN (status_F, status_O, status_P))
    ORDER BY o_orderpriority, status
    """,
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide pivot back to long form via
    ``DataFrame.unpivot`` — ids stay, each value column becomes a row."""
    wide = pivot_status_by_priority(spark, sf_dir)
    return (
        wide.unpivot(
            ["o_orderpriority"],
            [f"status_{s}" for s in _STATUSES],
            "status",
            "n_orders",
        )
        .orderBy("o_orderpriority", "status")
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT
      l_returnflag,
      ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
      ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
      ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) per group.  Spark's
    ``percentile`` matches SQL-standard PERCENTILE_CONT (linear
    interpolation), same as DuckDB's quantile_cont.  At 100 TB swap in
    ``percentile_approx`` (bounded-memory sketch) — kept exact here so
    the oracle can check values, with the GK approx variant exercised
    (and rank-bound-pinned) in agg_approx_quantile.

    One ``percentile`` call with an array of percentages shares a single
    value buffer across all three estimates (three separate calls each
    build their own object-agg buffer — measured 1.5× slower at sf0.1);
    partial aggregation still runs map-side, so the shuffle carries one
    digest per (partition × group), not raw rows.  Narrow scan: even the
    per-row buffer insert is cheaper than the widening exchange at sf0.1
    (and a 100 TB table arrives pre-split anyway)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").alias("ps")
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 4).alias("p50_price"),
            F.round(F.element_at("ps", 2), 4).alias("p90_price"),
            F.round(F.element_at("ps", 3), 4).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "subquery_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    )
    ORDER BY c_custkey
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via Spark SQL — Catalyst decorrelates it into a
    left-semi join (same plan as the explicit join_semi operator; this
    proves the SQL surface)."""
    vc = scoped_view(spark, sf_dir, "customer", "sq_customer")
    vo = scoped_view(spark, sf_dir, "orders", "sq_orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM {vc} c
        WHERE EXISTS (
          SELECT 1 FROM {vo} o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
        )
        ORDER BY c_custkey
        """
    )


@query(
    "subquery_scalar",
    # mean via DECIMAL sum / count: order-independent on both engines, so
    # the threshold is bit-identical (functions/parity.py)
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      FROM orders
    )
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders above 1.5× the mean price).
    The subquery evaluates once and broadcasts as a literal — no
    per-row re-evaluation."""
    vo2 = scoped_view(spark, sf_dir, "orders", "sq2_orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice
        FROM {vo2}
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
          FROM {vo2}
        )
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
        """
    )


@query(
    "lateral_topk_per_group",
    oracle="""
    SELECT n.n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS c_acctbal
    FROM nation n JOIN LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) t ON TRUE
    ORDER BY n_name, c_acctbal DESC, c_custkey
    """,
)
def lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT (the
    SQL-standard spelling of top-k-per-group).  Catalyst decorrelates the
    lateral into the same window/top-k plan as window_topk_per_group —
    this proves the SQL surface, not a new physical strategy."""
    vn = scoped_view(spark, sf_dir, "nation", "lat_nation")
    vcu = scoped_view(spark, sf_dir, "customer", "lat_customer")
    return spark.sql(
        f"""
        SELECT n.n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS c_acctbal
        FROM {vn} n JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM {vcu} c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        ORDER BY n_name, c_acctbal DESC, c_custkey
        """
    )


@query(
    "scalar_collation_filter",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    WHERE lower(event_type) IN ('click', 'view')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_collation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 ``COLLATE UTF8_LCASE``):
    case-insensitive predicates expressed as a column property instead of
    wrapping every operand in lower() — the collation participates in
    codegen'd comparisons directly.  Output keys are projected through
    lower() only for cross-engine determinism of the representative."""
    ev = load_table(spark, sf_dir, "events")
    ci = F.expr("event_type COLLATE UTF8_LCASE")
    return (
        ev.filter(ci.isin("CLICK", "View"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "analytics_skyline_2d",
    oracle="""
    WITH pts AS (
      SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT price, size FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.price <= a.price AND b.size >= a.size
        AND (b.price < a.price OR b.size > a.size)
    )
    ORDER BY price, size
    """,
)
def analytics_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the parts no other part beats on
    BOTH cheaper price and larger size — the classic multi-criteria
    shortlist operator.

    The oracle states dominance as a quadratic NOT EXISTS; the engine
    runs a PARTITION-PARALLEL two-level sweep instead of a global sort:
    (1) hash prices into ordered buckets; within each bucket a window
    sweep (price ASC, size DESC) keeps points whose size strictly
    exceeds the running predecessor max — predecessors are exactly the
    in-bucket dominators; (2) cross-bucket dominance needs only each
    bucket's MAX size: a point also survives iff its size exceeds the
    running max of all strictly-cheaper buckets' maxima (every point
    there is strictly cheaper).  Level 1 parallelizes per bucket, level
    2 is a bucket-count-sized frame broadcast back — no global
    single-partition window anywhere, which is what makes the sweep hold
    at 100 TB (skylines compose associatively under this rule).
    """
    part = load_table(spark, sf_dir, "part")
    # incomparable (NULL-dimension) points are excluded on both engines:
    # SQL NOT EXISTS can never find a dominator for a NULL size (every
    # comparison is NULL) while the window sweep silently drops it —
    # dominance is only defined over fully-known points
    pts = (
        part.filter(
            F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
        )
        .select(F.col("p_retailprice").alias("price"), F.col("p_size").alias("size"))
        .distinct()
    )
    pts = pts.withColumn("bucket", F.floor(F.col("price") / 200.0))
    in_bucket = Window.partitionBy("bucket").orderBy(
        F.asc("price"), F.desc("size")
    ).rowsBetween(Window.unboundedPreceding, -1)
    survivors = pts.withColumn("prev_max", F.max("size").over(in_bucket)).filter(
        F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max"))
    )
    bucket_max = pts.groupBy("bucket").agg(F.max("size").alias("bmax"))
    prev_buckets = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_cummax = bucket_max.withColumn(
        "prev_bmax", F.max("bmax").over(prev_buckets)
    ).select("bucket", "prev_bmax")
    return (
        survivors.join(F.broadcast(bucket_cummax), "bucket")
        .filter(F.col("prev_bmax").isNull() | (F.col("size") > F.col("prev_bmax")))
        .select("price", "size")
        .orderBy("price", "size")
    )
