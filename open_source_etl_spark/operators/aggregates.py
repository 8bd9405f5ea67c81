"""Aggregation family: grouped/global/conditional aggs, rollup/cube,
HAVING, collect_list/set, argmin/argmax, approx sketches.

Provenance (SURVEY.md §2A.2-3, §2B "Aggregation"): the reference's
validation layer is `COUNT(*) WHERE …` under GE/dbt (`schema.yml:8-21`,
`…data_expectations.json:4-97`); generalized here to the standard family.

Scale notes: every groupBy below gets automatic partial (map-side)
aggregation from Spark — the shuffle carries one row per (partition ×
group), not per input row. count_distinct shuffles the distinct values
first (expand + two-phase agg); approx_count_distinct replaces that with
a fixed-size HLL sketch per group — the 100 TB answer when exactness
isn't required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, scoped_view
from ..functions.parity import davg, dsum, sql_davg, sql_dsum
from ..registry import query


@query(
    "agg_grouped_basic",
    oracle=f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n_orders,
      COUNT(DISTINCT o_custkey) AS n_customers,
      {sql_dsum('o_totalprice')} AS total_revenue,
      ROUND({sql_davg('o_totalprice')}, 4) AS avg_price,
      MIN(o_totalprice) AS min_price,
      MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def agg_grouped_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum/avg/min/max/count/count_distinct (partial+final agg)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("total_revenue"),
            F.round(davg("o_totalprice"), 4).alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(DISTINCT l_suppkey) AS n_suppliers,
      {sql_dsum('l_quantity')} AS total_qty,
      MIN(l_shipdate) AS first_ship,
      MAX(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregation collapsing to one row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        dsum("l_quantity").alias("total_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "agg_filtered_conditional",
    oracle=f"""
    SELECT
      c_mktsegment,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      {sql_dsum("CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0 END")} AS big_order_revenue,
      COUNT(*) AS n_total
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counting / filtered aggregation (GE checks as aggs)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias(
                "n_urgent"
            ),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            dsum(
                F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(0.0)
            ).alias("big_order_revenue"),
            F.count("*").alias("n_total"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_approx_distinct",
    # the raw HLL++ estimate is engine-specific (DuckDB uses a different
    # sketch), so the value-checked surface is the exact twin plus a
    # 3-sigma error-bound pin on the estimate — any sketch regression
    # (hashing, register merge, bias correction) flips the flag
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_6pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct via HLL++ (fixed-memory sketch per group).

    The 100 TB substitute for exact countDistinct (rsd 2% here — 4x
    fewer HLL registers than 1% for ~1.5x faster updates, still far
    tighter than Spark's 0.05 default).  Narrow scan: the register
    update is cheaper than a round-robin exchange of the rows (measured
    2.5x at sf0.1).

    Driver pin: an exact countDistinct twin (two-level partial-distinct
    form, broadcast-joined back — see approx_distinct_raw for why it
    must not share the sketch's agg call) makes the sketch checkable —
    ``approx_within_6pct`` asserts the estimate is inside 3x the
    configured rsd via integer arithmetic (no float parity risk).  At
    100 TB one would drop the exact twin and keep only the sketch; the
    estimate itself is deterministic for a given dataset (register
    max-merge is order-independent).
    """
    raw = approx_distinct_raw(load_table(spark, sf_dir, "lineitem"))
    return raw.select(
        "l_returnflag",
        "n_rows",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts")) * 100
            <= F.col("exact_parts") * 6
        ).alias("approx_within_6pct"),
    ).orderBy("l_returnflag")


def approx_distinct_raw(li: DataFrame) -> DataFrame:
    """Raw HLL++ estimates next to their exact twins — the registry
    query projects the bound flag from this; the tighter 6-sigma pin in
    tests/test_sketch_quality.py reads the estimates.

    The exact twin deliberately does NOT share the sketch's agg call:
    mixing ``countDistinct`` into the same ``agg`` forces the planner's
    distinct-rewrite onto every aggregate in the list (measured 1.85 s
    vs 0.77 s at sf0.1).  Instead the exact side is the scale-canonical
    two-level form — partial-distinct on (group, key) map-side, then a
    count of survivors — broadcast-joined back (3 rows) to the sketch
    pass."""
    appx = li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )
    exact = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.first(F.lit(1)))
        .groupBy("l_returnflag")
        .agg(F.count("*").cast("bigint").alias("exact_parts"))
    )
    return appx.join(F.broadcast(exact), "l_returnflag")


@query(
    "agg_rollup",
    oracle=f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n_orders,
      {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n_items,
      {sql_dsum('l_quantity', 'DECIMAL(8,2)')} AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of the two keys.  The expand
    (×4 grouping sets) multiplies per-row work but stays cheaper than a
    row exchange (narrow scan measured 1.8x faster at sf0.1); quantity
    (exact 2dp, < 10^6) sums at DECIMAL(8,2) to stay on the Long-backed
    decimal fast path."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_quantity", "decimal(8,2)").alias("total_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT
      l_suppkey,
      COUNT(*) AS n_items,
      {sql_dsum('l_extendedprice')} AS supplier_revenue
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 500
    ORDER BY l_suppkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (`.agg(...).filter(...)`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("supplier_revenue"))
        .filter(F.col("n_items") > 500)
        .orderBy("l_suppkey")
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT
      n.n_name AS nation_name,
      array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), ',') AS segments
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY nation_name
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set wrapped in sort_array (order-insensitive by construction).

    The output column is serialized with array_join — the driver's pandas
    canonicalizer cannot hash list cells (CORRECTNESS_r01 `agg_collect_sorted`
    err), so nested results ship as deterministic strings on both sides.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            )
        )
        .orderBy("nation_name")
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT
      o_orderstatus,
      max_by(o_orderkey, o_totalprice) AS priciest_order,
      MAX(o_totalprice) AS max_price,
      min_by(o_orderkey, o_totalprice) AS cheapest_order,
      MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) per group."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.max("o_totalprice").alias("max_price"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT
      c_mktsegment,
      c_nationkey,
      COUNT(*) AS n_customers,
      {sql_dsum('c_acctbal')} AS total_balance
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (`spark.sql`)."""
    view = scoped_view(spark, sf_dir, "customer", "customer_gs")
    return spark.sql(
        f"""
        SELECT
          c_mktsegment,
          c_nationkey,
          COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
        FROM {view}
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY c_mktsegment, c_nationkey
        """
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT
      l_returnflag,
      ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
      ROUND(var_samp(l_quantity), 6) AS qty_var,
      ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
      ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: sample stddev/variance,
    correlation, covariance — single-pass streaming moments (Welford
    updates compose across partitions, so these are partial-aggregation
    friendly like sum/count)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_covar"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_hll_sketch_union",
    # the DataSketches estimate is sketch-algorithm-specific, so the
    # value-checked surface is the exact distinct twin plus a 3-sigma
    # bound pin on every estimate — including the MERGED one, which is
    # the operator's point (union of per-group sketches, no rescan)
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys
      FROM orders GROUP BY o_orderpriority
    ),
    a AS (
      SELECT 'ALL' AS o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys
      FROM orders
    )
    SELECT o_orderpriority, n_orders, exact_custkeys,
           TRUE AS est_within_5pct
    FROM (SELECT * FROM g UNION ALL SELECT * FROM a)
    ORDER BY o_orderpriority
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL,
    Spark 3.5+): build one reusable sketch per order priority with
    ``hll_sketch_agg``, estimate each, then MERGE the per-group sketches
    with ``hll_union_agg`` for the global estimate — no rescan of the
    fact table.  This build-once/merge-anywhere pattern is the 100 TB
    answer to distinct counts across rollup levels (vs. re-shuffling the
    raw keys per level).

    Driver pin: exact countDistinct twins (per-group in the same agg
    pass; one extra tiny agg for the global row since per-group exacts
    don't compose across overlapping custkeys) make every estimate
    checkable — ``est_within_5pct`` is 3x the default-lgK=12 relative
    standard error (1.04/sqrt(4096) ~ 1.6%), integer arithmetic only.
    The merged row's flag specifically catches union-merge bugs that
    per-group estimates cannot see.
    """
    raw = hll_sketch_union_raw(load_table(spark, sf_dir, "orders"))
    return raw.select(
        "o_orderpriority",
        "n_orders",
        "exact_custkeys",
        (
            F.abs(F.col("est_custkeys") - F.col("exact_custkeys")) * 100
            <= F.col("exact_custkeys") * 5
        ).alias("est_within_5pct"),
    ).orderBy("o_orderpriority")


def hll_sketch_union_raw(orders: DataFrame) -> DataFrame:
    """Per-priority and merged-ALL HLL estimates next to exact twins —
    the registry query projects the bound flag; the tighter 6-sigma pin
    in tests/test_sketch_quality.py reads the estimates.

    Everything per-group derives from ONE (priority, custkey) partial
    aggregation: HLL insertion is duplicate-insensitive, so sketching
    the deduplicated pairs yields byte-identical sketches to sketching
    raw orders while the same frame carries the exact distinct count
    (count of pairs) and the order count (sum of pair multiplicities) —
    no countDistinct mixed into a sketch agg (see approx_distinct_raw),
    no second wide scan.  Only the merged row's exact twin re-reads the
    (narrow, dimension-sized) orders scan, since per-group exacts don't
    compose across overlapping custkeys."""
    pairs = orders.groupBy("o_orderpriority", "o_custkey").agg(
        F.count("*").alias("cnt")
    )
    sketches = pairs.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.sum("cnt").cast("bigint").alias("n_orders"),
        F.count("*").cast("bigint").alias("exact_custkeys"),
    )
    per_group = sketches.select(
        "o_orderpriority",
        "n_orders",
        "exact_custkeys",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_custkeys"),
    )
    exact_all = (
        orders.groupBy("o_custkey")
        .agg(F.first(F.lit(1)))
        .agg(F.count("*").cast("bigint").alias("exact_custkeys"))
    )
    merged = sketches.agg(
        F.lit("ALL").alias("o_orderpriority"),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
            "est_custkeys"
        ),
    ).crossJoin(exact_all)
    return per_group.unionByName(merged, allowMissingColumns=False)


@query(
    "agg_salted_hotkey",
    oracle="""
    SELECT event_type,
           CAST(COUNT(event_id) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value,
           CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (``functions/skew.py``): phase 1
    groups by (key, salt) so a pathological hot key spreads over n_salts
    reducers, phase 2 combines the tiny partials by key alone.  The
    event_type column is exactly that shape — a handful of keys owning
    the whole table.  Decimal interior keeps the sum order-independent,
    so the salted result hash-matches the plain GROUP BY oracle."""
    from ..functions.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.col("value").cast("decimal(18,6)")
    )
    out = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "sum_value": ("v", "sum"),
            "min_value": ("v", "min"),
            "max_value": ("v", "max"),
        },
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    ).orderBy("event_type")


@query(
    "agg_median",
    oracle="""
    SELECT
      o_orderstatus,
      ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN per group (Spark ``median`` = PERCENTILE_CONT 0.5, linear
    interpolation — same as DuckDB quantile_cont).  Exact median buffers
    the group's values; at 100 TB swap to ``percentile_approx`` (t-digest
    sketch, bounded memory) exactly as with agg_percentiles."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT
      c_nationkey,
      string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 ``LISTAGG … WITHIN GROUP``):
    the SQL-standard form of collect_list+sort+join, with the ordering
    declared inside the aggregate so the result is deterministic without
    a post-hoc sort_array (agg_collect_sorted shows that older idiom)."""
    view = scoped_view(spark, sf_dir, "customer", "la_customer")
    return spark.sql(
        f"""
        SELECT
          c_nationkey,
          listagg(DISTINCT c_mktsegment, ',')
            WITHIN GROUP (ORDER BY c_mktsegment) AS segments,
          COUNT(*) AS n_customers
        FROM {view}
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation (Spark 3.5+
    ``bitmap_construct_agg``): keys bucket into 32k-bit bitmaps per
    (group, bucket), bitmap_count sums the set bits — the
    ClickHouse/Doris-style roaring-bitmap technique.  Against
    COUNT(DISTINCT x)'s expand-and-reshuffle of every distinct value,
    the shuffle here carries one fixed-size bitmap per (group, bucket):
    for dense integer keys that is a large constant-factor win, while
    staying EXACT (the oracle is plain COUNT DISTINCT) — the middle
    ground between exact countDistinct and the HLL sketch
    (agg_approx_distinct)."""
    view = scoped_view(spark, sf_dir, "lineitem", "bm_lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag,
               CAST(SUM(bucket_distinct) AS BIGINT) AS n_parts,
               CAST(SUM(bucket_rows) AS BIGINT) AS n_rows
        FROM (
          SELECT l_returnflag,
                 bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_partkey)))
                   AS bucket_distinct,
                 COUNT(*) AS bucket_rows
          FROM {view}
          GROUP BY l_returnflag, bitmap_bucket_number(l_partkey)
        )
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT
      CASE WHEN GROUPING(o_orderstatus) = 1 THEN '<all>' ELSE o_orderstatus END
        AS status,
      CASE WHEN GROUPING(o_orderpriority) = 1 THEN '<all>' ELSE o_orderpriority END
        AS priority,
      GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS grouping_level,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY grouping_level, status, priority
    """,
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping_id over a rollup: labels that distinguish a
    subtotal row's NULL from a data NULL — without it, rollup output is
    ambiguous the moment the grouped column itself contains NULLs.  The
    '<all>' relabeling is how report layers render subtotal rows."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.when(F.col("g_status") == 1, "<all>")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("g_priority") == 1, "<all>")
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            (F.col("g_status") * 2 + F.col("g_priority"))
            .cast("bigint")
            .alias("grouping_level"),
            "n_orders",
        )
        .orderBy("grouping_level", "status", "priority")
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT
      l_returnflag,
      bit_and(l_orderkey) AS all_and,
      bit_or(l_orderkey) AS any_or,
      bit_xor(l_orderkey) AS parity_xor,
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and / bit_or / bit_xor): flag-mask
    consolidation and parity folding over integer columns — associative
    and commutative, so they combine map-side like any sum and the
    shuffle carries one 64-bit value per (partition, group).  xor is the
    classic checksum for did-every-row-arrive-exactly-once audits
    (a pair of duplicated-and-dropped rows cancels; a single dup
    flips)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_orderkey").alias("all_and"),
            F.bit_or("l_orderkey").alias("any_or"),
            F.bit_xor("l_orderkey").alias("parity_xor"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_histogram_bins",
    oracle="""
    WITH binned AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 60000) AS BIGINT), 9) AS bin
      FROM orders
    )
    SELECT bin,
           CAST(bin * 60000.0 AS DOUBLE) AS bin_lo,
           CAST(CASE WHEN bin = 9 THEN NULL ELSE (bin + 1) * 60000.0 END AS DOUBLE) AS bin_hi,
           COUNT(*) AS n_orders
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: order values binned into 10 fixed-width
    buckets (top bucket open-ended) — the distribution-profiling
    primitive behind data exploration and skew diagnosis.  The bin is
    FLOOR of one double division, the identical IEEE computation on both
    engines (deliberately not width_bucket, whose edge semantics differ
    across dialects); binning is map-side, the shuffle carries 10 rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 60000), F.lit(9)).cast("bigint")
    return (
        orders.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "bin",
            (F.col("bin") * 60000.0).alias("bin_lo"),
            F.when(F.col("bin") == 9, F.lit(None).cast("double"))
            .otherwise((F.col("bin") + 1) * 60000.0)
            .alias("bin_hi"),
            "n_orders",
        )
        .orderBy("bin")
    )


@query(
    "agg_regression_family",
    oracle="""
    SELECT
      l_returnflag,
      CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
      ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
      ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS base_price,
      ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS fit_r2,
      ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS mean_qty,
      ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS mean_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_regression_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS per group via the SQL-standard REGR_* aggregates
    (price ~ quantity per return flag): slope, intercept, R², and the
    marginal means, all in ONE pass.  Like the other moment aggregates
    these are streaming partial-aggregation-friendly (sums of x, y, xy,
    x², y² compose across partitions), so at 100 TB the shuffle carries
    five accumulators per group, never the rows.  EXT beyond the
    reference (its dbt layer has no model-fitting tier); rounded on both
    engines because the final divisions are IEEE doubles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("bigint").alias("n_pairs"),
            F.round(F.regr_slope(y, x), 4).alias("price_per_qty"),
            F.round(F.regr_intercept(y, x), 4).alias("base_price"),
            F.round(F.regr_r2(y, x), 6).alias("fit_r2"),
            F.round(F.regr_avgx(y, x), 6).alias("mean_qty"),
            F.round(F.regr_avgy(y, x), 4).alias("mean_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_quantile",
    # the GK sketch's returned element is engine-specific (DuckDB's
    # approx_quantile is t-digest), so the value-checked surface is a
    # rank-error pin on each GK answer: the returned element's rank
    # must sit within the published 1/accuracy rank-error band (checked
    # with 2x slack, integer arithmetic only).  min/max ride along as
    # cheap exact anchors; the full exact interpolated percentiles are
    # value-checked by agg_percentiles on the same table and column.
    oracle="""
    SELECT
      l_returnflag,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      MIN(l_extendedprice) AS lo_price,
      MAX(l_extendedprice) AS hi_price,
      TRUE AS gk_rank_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's Greenwald–Khanna sketch
    (``percentile_approx``, relative rank error <= 1/accuracy): the
    bounded-memory alternative to ``agg_percentiles``'s exact sort-based
    percentiles.  At 100 TB the exact form must shuffle every value to
    its group; the GK sketch keeps O(accuracy · log n) per group and
    merges across partitions.

    Driver pin: a second narrow (2-column) scan joined to the
    broadcast 3-row stats frame counts each group's values strictly
    below / at-or-below every GK answer; ``gk_rank_ok`` asserts the
    answer's rank interval intersects [q*n - 2n/acc - acc, q*n +
    2n/acc + acc] in integer arithmetic (2x the guarantee plus one
    element of slack — a sketch whose merge or compress is broken
    misses by orders of magnitude).  The exact interpolated
    percentiles are deliberately NOT recomputed here (agg_percentiles
    value-checks that exact path on the same column; duplicating its
    object-agg buffer would double this query's cost for no added
    coverage) — min/max are the cheap exact anchors.  At 100 TB the
    verification scan drops away, leaving the single sketch pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    acc = GK_ACCURACY
    stats = approx_quantile_raw(li)
    ranks = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(stats.select("l_returnflag", "a50", "a90", "a99")),
              "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            *[
                agg_col
                for q in (50, 90, 99)
                for agg_col in (
                    F.sum(
                        (F.col("l_extendedprice") < F.col(f"a{q}")).cast("long")
                    ).alias(f"lo{q}"),
                    F.sum(
                        (F.col("l_extendedprice") <= F.col(f"a{q}")).cast("long")
                    ).alias(f"hi{q}"),
                )
            ]
        )
    )

    def rank_ok(qa: int) -> "F.Column":
        n = F.col("n_rows")
        lo, hi = F.col(f"lo{qa // 100}"), F.col(f"hi{qa // 100}")
        # rank band [qa*n - 2n - acc, qa*n + 2n + acc] in units of 1/acc
        return (lo * acc <= qa * n + 2 * n + acc) & (hi * acc >= qa * n - 2 * n - acc)

    return (
        stats.join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "lo_price",
            "hi_price",
            (rank_ok(5000) & rank_ok(9000) & rank_ok(9900)).alias("gk_rank_ok"),
        )
        .orderBy("l_returnflag")
    )


GK_ACCURACY = 10000


def approx_quantile_raw(li: DataFrame) -> DataFrame:
    """Per-group GK estimates (a50/a90/a99) with exact min/max anchors,
    one agg pass — the registry query derives the rank-bound flag; the
    tighter rank-error pin in tests/test_sketch_quality.py reads the
    estimates."""
    acc = F.lit(GK_ACCURACY)
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("l_extendedprice").alias("lo_price"),
        F.max("l_extendedprice").alias("hi_price"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), acc).alias("a50"),
        F.percentile_approx("l_extendedprice", F.lit(0.9), acc).alias("a90"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), acc).alias("a99"),
    )


def approx_topk_entries(li: DataFrame, k: int = 10, cap: int = 10000) -> DataFrame:
    """(qty, est_count) rows from one ``approx_top_k`` sketch pass over
    ``l_quantity`` — shared by the registry query's pin and the tighter
    accuracy test in tests/test_sketch_quality.py."""
    return (
        li.select(F.expr(f"approx_top_k(l_quantity, {k}, {cap})").alias("top"))
        .select(F.posexplode("top").alias("rank", "entry"))
        .select(
            F.col("entry.item").cast("bigint").alias("qty"),
            F.col("entry.count").cast("bigint").alias("est_count"),
        )
    )


@query(
    "agg_approx_topk",
    # which keys the sketch surfaces under count TIES is engine-specific,
    # so the value-checked surface is a one-row pin over the entries
    # joined to their exact counts: all 10 estimates must EQUAL the
    # exact count (the sketch tracks the 50-value domain exactly below
    # its capacity) and the smallest returned estimate must equal the
    # 10th-largest exact count (any tied boundary key satisfies it)
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_entries,
           CAST(10 AS BIGINT) AS n_exact_count_matches,
           TRUE AS topk_boundary_ok
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k heavy hitters via the ``approx_top_k`` sketch
    (Spark 4): the 10 most frequent quantity values across lineitem,
    tracked in bounded per-partition sketch state that merges map-side —
    the scale replacement for an exact count-then-sort whose aggregation
    state is the full key cardinality.

    The hot domain is deliberately heavy-hitter-SHAPED (l_quantity: 50
    values, each genuinely frequent): that is the regime the sketch
    serves at 100 TB — a bounded hot set inside an unbounded stream.
    On a uniform high-cardinality key (l_partkey at sf0.1+) the
    DataSketches frequent-items sketch correctly reports NO heavy
    hitters once n >> capacity (every count sits below the error
    floor), returning an empty array — honest, but nothing to pin.

    Driver pin: the 10 sketch entries hash-join (broadcast: 10 rows) to
    the exact per-key counts; with capacity 10000 far above the fixed
    50-value domain the sketch never purges, so every estimate must
    EQUAL its exact count at any scale, and the smallest returned
    estimate must equal the 10th-largest exact count (tie-safe: any
    boundary key the sketch picks shares that count).  The exact-count
    scan exists only for verification — 50 groups, map-side combined —
    and ``tests/test_sketch_quality.py`` additionally pins top-k
    membership overlap."""
    li = load_table(spark, sf_dir, "lineitem")
    entries = approx_topk_entries(li)
    exact = li.groupBy(F.col("l_quantity").cast("bigint").alias("qty")).agg(
        F.count("*").cast("bigint").alias("exact_count")
    )
    kth = (
        exact.orderBy(F.desc("exact_count"), "qty")
        .limit(10)
        .agg(F.min("exact_count").alias("kth_count"))
    )
    return (
        exact.join(F.broadcast(entries), "qty")
        .crossJoin(F.broadcast(kth))
        .agg(
            F.count("*").cast("bigint").alias("n_entries"),
            F.sum(
                (F.col("est_count") == F.col("exact_count")).cast("bigint")
            ).alias("n_exact_count_matches"),
            (F.min("est_count") == F.first("kth_count")).alias("topk_boundary_ok"),
        )
    )
