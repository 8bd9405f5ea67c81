"""Headline analytics queries (TPC-H-shaped, GEN of SURVEY.md §2B):
multi-join + aggregate + sort pipelines that exercise the full optimizer
path — broadcast dimension joins, partial aggregation, top-k without a
full sort — the shapes a 100 TB warehouse runs all day.

Numeric parity follows functions/parity.py: revenue sums accumulate in
DECIMAL (order-independent) and only then cast to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hints import maybe_broadcast
from ..registry import query

# price(2dp) × discount(2dp) → exact at 4dp; DECIMAL(28,6) headroom for sums
_REV_SQL = "CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))"


def _revenue() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l.l_orderkey,
      CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → grouped revenue →
    top-10 by revenue.  Filters push into all three scans before the
    joins; the limit rides the sort (TakeOrdered), so no full result
    materializes."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT
      n.n_name,
      CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star with a local-supplier (same-nation)
    constraint.  supplier/nation/region broadcast (bounded dims); the
    only shuffles are fact⋈fact (orders⋈lineitem via customer) and the
    final aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            maybe_broadcast(supp, cache_key=(sf_dir, "supplier")),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT
      c.c_custkey,
      c.c_name,
      CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
      c.c_acctbal,
      n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking per customer —
    quarter-filtered orders, returnflag-filtered lineitem, nation
    broadcast, top-20 customers by lost revenue."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT
      cn.n_name AS cust_nation,
      sn.n_name AS supp_nation,
      EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
      CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
      AND l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY cn.n_name, sn.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    ORDER BY cust_nation, supp_nation, order_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by (customer nation,
    supplier nation, year).  The nation dimension joins TWICE under
    different roles — both broadcast; the aliasing is the point (a naive
    engine conflates the two sides)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(supp, cache_key=(sf_dir, "supplier")), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "order_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT
      n.n_name AS nation,
      EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
      CAST(SUM({_REV_SQL}) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    ORDER BY nation, order_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year.
    The selective part-name filter prunes lineitem via the broadcast
    part⋈lineitem join before the fact⋈fact orders join; supplier and
    nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp, cache_key=(sf_dir, "supplier")), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("profit"))
        .orderBy("nation", F.col("order_year").desc())
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including the
    zero bucket — outer join with a JOIN-SIDE predicate (not a WHERE, or
    the zero-order customers vanish), then a two-level aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT
      CAST(100.00 * SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
        / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-03-01'
      AND l.l_shipdate < DATE '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship-month — a
    broadcast part join feeding two conditional DECIMAL sums; the ratio
    divides only after exact accumulation, so the result is
    order-independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                (F.lit(100.00) * F.sum(promo).cast("double"))
                / F.sum(rev).cast("double")
            ).alias("promo_pct")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, agg.sum_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    ) agg
    JOIN orders o ON o.o_orderkey = agg.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — aggregate lineitem FIRST
    (map-side partial sums shrink the fact table before any join), filter
    with HAVING, then join the survivors to orders/customer.  Quantities
    are integral doubles, so the sums are exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q22_sales_opportunity",
    # avg threshold multiplied through (bal * n > total) so both engines
    # compare exact DECIMAL quantities — no float-average boundary flips
    oracle="""
    WITH pos AS (
      SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM pos)
          > (SELECT SUM(bal) FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no urgent orders, by nation
    (every fixture customer has *some* order, so the anti-join keys on
    the urgent subset to keep the result non-empty).  The global-average
    threshold is cross-multiplied (bal·n > Σbal) so the predicate
    compares exact DECIMALs; the no-urgent-orders test is a left-anti
    join; the 1-row threshold aggregate broadcasts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    nation = load_table(spark, sf_dir, "nation")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.count("*").alias("n_pos"),
            F.sum(bal).alias("total_pos"),
        )
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(bal * F.col("n_pos") > F.col("total_pos"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )


@query(
    "q2_min_cost_supplier",
    # the fixture has no partsupp table, so lineitem plays the supply
    # relation: unit_cost = min(extendedprice/quantity) per (part, supplier).
    # Double division is IEEE-identical across engines; MIN and the
    # equality join back are exact comparisons, so no rounding drift.
    oracle="""
    WITH supply AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
      GROUP BY 1, 2
    ), best AS (
      SELECT partkey, MIN(unit_cost) AS best_cost FROM supply GROUP BY 1
    )
    SELECT CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, s.s_name,
           n.n_name AS nation, p.p_partkey, p.p_name,
           CAST(b.best_cost AS DOUBLE) AS unit_cost
    FROM part p
    JOIN best b ON p.p_partkey = b.partkey
    JOIN supply sp ON sp.partkey = b.partkey AND sp.unit_cost = b.best_cost
    JOIN supplier s ON sp.suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
    ORDER BY s_acctbal DESC, nation, s_name, p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the EUROPE supplier with the minimum unit
    cost (correlated-min rewritten as agg + equality join back — the
    decorrelation Catalyst itself would emit).  The supplier⋈nation⋈region
    dimension chain broadcasts; the per-(part,supplier) aggregation is the
    only shuffle over lineitem, and everything after runs on the ~|part|
    sized aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    eur_keys = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("s_suppkey").alias("eur_suppkey"))
    )
    supply = (
        li.join(maybe_broadcast(eur_keys, cache_key=(sf_dir, "q2_eur_suppkeys")), li.l_suppkey == F.col("eur_suppkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = supply.groupBy(F.col("partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    winners = supply.join(
        best,
        (supply.partkey == best.b_partkey) & (supply.unit_cost == best.best_cost),
    )
    # fresh scans for the output dimensions: supp/nation already feed
    # eur_keys, and reusing those plans trips the self-join ambiguity check
    supp_out = load_table(spark, sf_dir, "supplier")
    nation_out = load_table(spark, sf_dir, "nation")
    return (
        winners.join(part, F.col("partkey") == part.p_partkey)
        .join(maybe_broadcast(supp_out, cache_key=(sf_dir, "supplier")), F.col("suppkey") == supp_out.s_suppkey)
        .join(F.broadcast(nation_out), supp_out.s_nationkey == nation_out.n_nationkey)
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.col("best_cost").cast("double").alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    # no commit/receipt dates in the fixture — "late" = a lineitem shipped
    # more than 60 days after the order date
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1 ORDER BY 1
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with >=1 late lineitem —
    correlated EXISTS as a left-semi join whose condition mixes the equi
    key with a non-equi date comparison (the semi dedups, so no DISTINCT
    pass).  The date filter prunes the orders scan before the join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT
      EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
      CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV_SQL}
                    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
        / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY 1 ORDER BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of AMERICA-region revenue per
    year — the same fact join tree as Q5/Q7 with the nation dimension
    joined twice under different roles (customer side filters the region,
    supplier side labels the share).  Both conditional sums accumulate in
    DECIMAL and divide only at the end, so the ratio is order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") <= "1996-12-31")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cnat = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    snat = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = _revenue()
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(maybe_broadcast(supp, cache_key=(sf_dir, "supplier")), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.sum(nation_rev).cast("double") / F.sum(rev).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("order_year")
    )


@query(
    "q11_important_parts",
    # threshold cross-multiplied (value * N > total) so both engines
    # compare exact DECIMALs; N=2000 puts the bar at the mean part share
    oracle=f"""
    WITH partrev AS (
      SELECT l.l_partkey AS partkey, SUM({_REV_SQL}) AS value
      FROM lineitem l GROUP BY 1
    )
    SELECT partkey, CAST(value AS DOUBLE) AS part_value
    FROM partrev
    WHERE value * 2000 > (SELECT SUM(value) FROM partrev)
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction of the
    global total (no partsupp in the fixture, so lineitem revenue is the
    'stock value').  One shuffle builds the per-part aggregate; the global
    total re-aggregates that small result and broadcasts back as a 1-row
    cross join — lineitem is scanned exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    partrev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(_revenue()).alias("value")
    )
    total = partrev.agg(F.sum("value").alias("total_value"))
    return (
        partrev.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 2000 > F.col("total_value"))
        .select("partkey", F.col("value").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@query(
    "q12_late_line_priority",
    # no l_shipmode in the fixture — l_linestatus stands in as the class
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line class, how many high- vs low-priority
    orders shipped in the window — a fact⋈fact join feeding two
    conditional counts.  The ship-date filter lands in the parquet scan,
    so the join input is ~1/7 of lineitem."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l.l_suppkey AS suppkey, SUM({_REV_SQL}) AS total_rev
      FROM lineitem l
      WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum quarterly revenue
    — the view+scalar-subquery formulation becomes agg → 1-row max →
    broadcast filter.  DECIMAL totals make the max-equality exact (a
    double sum could disagree with the oracle on ties)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_revenue()).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(maybe_broadcast(supp, cache_key=(sf_dir, "supplier")), F.col("suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "q16_part_supplier_variety",
    # lineitem stands in for partsupp as the part↔supplier relation
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, type, size) bucket.  The NOT/IN filters prune part before the
    broadcast join, and count_distinct runs as Spark's two-phase
    partial-distinct aggregate — no row explosion."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_qty_revenue",
    # qty < 0.2*avg(qty per part) cross-multiplied to qty*5*cnt < sum_qty:
    # quantities are integral doubles, so every side is exact
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS pk, SUM(l_quantity) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
    JOIN pq ON pq.pk = l.l_partkey
    WHERE l.l_quantity * 5 * pq.cnt < pq.sum_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one brand
    — the correlated per-part average decorrelated into an aggregate that
    joins back on partkey.  The per-part aggregate is |part|-sized —
    scaling, so no broadcast hint (the local planner still broadcasts it
    from actual size); lineitem is scanned twice."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pq, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_filter",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-arm disjunctive predicate that
    spans both join sides.  The brand/size disjunction's common superset
    (brand IN ..., size <= 15) is pre-applied to part so the broadcast
    build side stays small; the mixed-side residual evaluates post-join
    inside codegen."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") & (F.col("p_size") <= 15)
    )
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    arm1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11)
    arm2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & qty.between(10, 20)
    arm3 = (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & qty.between(20, 30)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q20_excess_shipments",
    # scale-free threshold: suppliers above the mean gear-part volume
    # (qty*N > total, cross-multiplied so every side is exact)
    oracle="""
    WITH gear AS (
      SELECT l.l_suppkey AS suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
      WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    WHERE s.s_suppkey IN (
      SELECT suppkey FROM gear
      WHERE qty * (SELECT COUNT(*) FROM gear) > (SELECT SUM(qty) FROM gear)
    )
    ORDER BY s.s_suppkey
    """,
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EUROPE suppliers who shipped an above-average
    volume of gear parts last year — a filtered aggregate, a global
    threshold broadcast back over it, then a semi join into the supplier
    dimension.  The part-name filter broadcasts into the lineitem scan, so
    the only wide shuffle is the per-supplier aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    gear = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    totals = gear.agg(F.count("*").alias("n_supp"), F.sum("qty").alias("total_qty"))
    heavy = (
        gear.crossJoin(F.broadcast(totals))
        .filter(F.col("qty") * F.col("n_supp") > F.col("total_qty"))
        .select("suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(maybe_broadcast(heavy, cache_key=(sf_dir, "q20_heavy_suppkeys")), supp.s_suppkey == F.col("suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_supplier",
    # no receipt/commit dates — "kept the order waiting" = this supplier's
    # line is the strict latest ship among multi-supplier 'F' orders
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate >= l1.l_shipdate
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier orders
    — a correlated EXISTS (left-semi) plus NOT EXISTS (left-anti), both
    self-joins on the order key with non-equi residuals.  Both probes
    shuffle on l_orderkey, so AQE coalesces them onto one exchange of the
    fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"),
        F.col("l_suppkey").alias("s2_key"),
        F.col("l_shipdate").alias("d2_ship"),
    )
    waiting = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key"))
            & (F.col("d2_ship") >= F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(maybe_broadcast(supp, cache_key=(sf_dir, "supplier")), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan → conjunctive filter → global sum, the
    canonical predicate-pushdown benchmark.  All three predicates reach
    the parquet scan (PushedFilters), the projection prunes to the three
    referenced columns, and the sum is a two-stage partial+final agg —
    the minimal possible plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue")
        )
    )
