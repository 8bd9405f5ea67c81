"""Round-2 analytics extensions: statistical modes, market-basket
affinity, RFM segmentation, Benford DQ, OHLC downsampling, triangle
counting, cross-engine content hashing and bounded-horizon EWMA.

All GEN/EXT rows in the SURVEY §2B sense — generalizations of the
reference's validation-count/aggregation semantics
(`dags/ingest_bundesliga_match_scores.py:24-210` runs COUNT/GROUP BY
probes over staged entities; these are the standard analytic families a
full engine offers over the same tables) — expressed Spark-first:
single-pass grouped aggregation wherever the semantics allow, windows
only where per-row ordering is inherent, no Python in any hot path.

Scale posture (100 TB):
- every query here is one or two hash shuffles on its natural key with
  map-side partial aggregation; no forced broadcasts of data-scaling
  frames (scale-policy guard applies);
- market-basket pair expansion is bounded by per-order basket size
  (quadratic in basket width, linear in orders);
- triangle counting enumerates on the nation-level trade graph (bounded
  node set); the docstring states the degree-ordering upgrade path for
  general graphs;
- EWMA uses a fixed 16-row horizon so the window never materializes an
  unbounded per-key history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY 1, 2
    )
    SELECT o_orderstatus,
           o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS n_mode
    FROM c
    QUALIFY row_number() OVER (
      PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority
    ) = 1
    ORDER BY o_orderstatus
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group statistical mode with a deterministic tie-break.

    Spark 3.4+ has ``F.mode`` but its tie-break is unspecified, so the
    engine computes mode as the classic two-level plan: grouped count,
    then a per-group argmax with an explicit (count DESC, value ASC)
    ordering — the only mode definition that is reproducible across
    engines and across runs.  Both levels are hash aggregations with
    map-side partials; the argmax is ``max_by`` over a struct ordering,
    NOT a row_number window, so the second level needs no sort — one
    extra skinny shuffle of (group, value, count) triples."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    # max_by over struct(n, reversed-priority) realizes (n DESC, prio ASC):
    # struct comparison is lexicographic, so negate the string ordering by
    # using min_by on struct(-n, prio).
    return (
        counts.groupBy("o_orderstatus")
        .agg(
            F.min_by(
                F.struct(
                    F.col("o_orderpriority").alias("mode_priority"),
                    F.col("n").alias("n_mode"),
                ),
                F.struct((-F.col("n")).alias("neg_n"), F.col("o_orderpriority")),
            ).alias("m")
        )
        .select(
            "o_orderstatus",
            F.col("m.mode_priority").alias("mode_priority"),
            F.col("m.n_mode").alias("n_mode"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "analytics_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tot AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items
    ), brand_n AS (
      SELECT p_brand, COUNT(*) AS n FROM items GROUP BY 1
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_pair
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(n_pair * 1.0 / t.n_orders, 6) AS support,
           ROUND(n_pair * 1.0 * t.n_orders / (na.n * nb.n), 6) AS lift
    FROM pairs
    CROSS JOIN tot t
    JOIN brand_n na ON na.p_brand = pairs.brand_a
    JOIN brand_n nb ON nb.p_brand = pairs.brand_b
    WHERE n_pair >= 3
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def analytics_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity (support / lift) over order baskets.

    Pair generation is a self-equi-join of the distinct (order, brand)
    frame on the order key — cost is Σ basket_width², linear in orders
    for bounded baskets (TPC-H ≈ 4 items/order), never all-pairs across
    the catalog.  Per-brand marginals and the order total are tiny agg
    frames; Spark's AQE broadcasts them into the final enrichment join
    on its own (no forced hint — brand cardinality is data-independent
    but the policy guard keeps hints off derived frames).  At 100 TB the
    only large shuffle is the items self-join, hash-partitioned on
    l_orderkey, which is also the key it was built on — AQE coalesces
    the exchange reuse."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = items.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    brand_n = items.groupBy("p_brand").agg(F.count("*").alias("n"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n").alias("n_a")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(na, "brand_a")
        .join(nb, "brand_b")
        .crossJoin(n_orders)
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("n_pair") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(20)
    )


@query(
    "analytics_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '2000-01-01')
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(o_totalprice) AS monetary
      FROM orders
      GROUP BY 1
    ), scored AS (
      SELECT
        ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_q,
        ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
        ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_q,
        monetary
      FROM rfm
    )
    SELECT r_q, f_q, m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(monetary), 4) AS avg_monetary
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation.

    One grouped pass builds the per-customer RFM triple; three global
    ``ntile(4)`` windows assign quartiles with an explicit custkey
    tie-break so the split is total-ordered and engine-reproducible;
    a final grouped rollup reports segment sizes.  The global ntile is
    the scale-sensitive step: a single-partition sort of |customers|
    rows.  At 100 TB the engine swaps it for the quantile-cut variant
    (``percentile_approx`` thresholds + a map-side bucket lookup, see
    ``datapipe_stratified_sample``) — kept exact here because the
    oracle contract pins exact quartile boundaries."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2000-01-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    )
    scored = rfm.select(
        F.ntile(4)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .alias("r_q"),
        F.ntile(4).over(Window.orderBy("frequency", "o_custkey")).alias("f_q"),
        F.ntile(4).over(Window.orderBy("monetary", "o_custkey")).alias("m_q"),
        "monetary",
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@query(
    "dq_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice >= 1
    ), c AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY 1
    ), t AS (
      SELECT SUM(n) AS total FROM c
    )
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / t.total, 6) AS obs_frac,
           ROUND(log10(1 + 1.0 / digit), 6) AS exp_frac,
           ROUND(ABS(n * 1.0 / t.total - log10(1 + 1.0 / digit)), 6) AS abs_dev
    FROM c CROSS JOIN t
    ORDER BY digit
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit profile — a data-quality
    screen for fabricated or truncated monetary columns (GEN of the
    reference's declarative value-set expectations,
    `great_expectations/expectations/…data_expectations.json:27-54`,
    lifted from set-membership to distribution-shape checking).

    Single scan → 9-group hash aggregation; the grand total is a
    second tiny agg cross-joined back (AQE broadcasts it).  Deviation
    from log10(1+1/d) is computed in-engine so the check ships as one
    declarative query with no driver-side constants."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(t)
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("obs_frac"),
            F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("exp_frac"),
            F.round(
                F.abs(F.col("n") / F.col("total") - F.log10(1 + 1 / F.col("digit"))),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@query(
    "timeseries_downsample_ohlc",
    oracle="""
    WITH w AS (
      SELECT event_type, date_trunc('hour', ts) AS h, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type,
           CAST(h AS TIMESTAMP) AS bucket_ts,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM w
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def timeseries_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) time-bucket downsampling of the event
    stream — the canonical telemetry/market-data rollup.

    Spark-first shape: ONE grouped aggregation with ``min_by``/``max_by``
    over a (ts, event_id) struct ordering — no window, no second shuffle,
    full map-side partial aggregation (open/close partials merge like
    min/max).  The oracle uses the equivalent two-row-number formulation
    because DuckDB's arg_min is single-key; results are identical since
    the struct tie-break totals the order.  At 100 TB this is exactly the
    rollup shape you want: shuffle carries one accumulator row per
    (type, hour), not the raw stream."""
    ev = load_table(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
        )
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type", "bucket_ts")
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT
        LEAST(c.c_nationkey, s.s_nationkey) AS a,
        GREATEST(c.c_nationkey, s.s_nationkey) AS b
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    )
    SELECT na.n_name AS nation_a, nb.n_name AS nation_b, nc.n_name AS nation_c
    FROM pairs e1
    JOIN pairs e2 ON e1.b = e2.a
    JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    JOIN nation na ON na.n_nationkey = e1.a
    JOIN nation nb ON nb.n_nationkey = e1.b
    JOIN nation nc ON nc.n_nationkey = e2.b
    ORDER BY 1, 2, 3
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the nation-level trade graph (which
    nations transact with each other via customer→supplier order flow).

    Edges are canonicalized (a < b) so each triangle is emitted exactly
    once by the standard two-join enumeration e1(a,b)⋈e2(b,c)⋈e3(a,c).
    The expensive part is building the edge list — a q7-shaped
    star join that reduces 100 TB of lineage to a ≤|nations|² frame;
    the triangle joins then run on the tiny canonical edge set.  For
    general (unbounded-node) graphs the same plan holds with one
    addition: orient edges from lower- to higher-degree endpoints
    first, which bounds the e1⋈e2 candidate expansion to O(m^1.5)
    (the standard compact-forward guarantee)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pairs = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
    )
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("ka"),
            F.col("e1.b").alias("kb"),
            F.col("e2.b").alias("kc"),
        )
    )
    na = nation.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("nation_a"))
    nb = nation.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("nation_b"))
    nc = nation.select(F.col("n_nationkey").alias("kc"), F.col("n_name").alias("nation_c"))
    return (
        tri.join(na, "ka")
        .join(nb, "kb")
        .join(nc, "kc")
        .select("nation_a", "nation_b", "nation_c")
        .orderBy("nation_a", "nation_b", "nation_c")
    )


@query(
    "scalar_hash_funcs",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           CAST(length(c_name) AS BIGINT) AS name_len
    FROM customer
    ORDER BY c_custkey
    """,
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine content hashing (MD5 / SHA-256 hex digests) — the
    primitive under exact dedup (`llm_dedup.dedup_exact`), change
    detection (`warehouse_snapshot_diff`) and leakage checks
    (`datapipe_contamination`), surfaced as its own contract row so the
    digest bytes themselves are oracle-pinned, not just downstream
    groupings.  Pure per-row JVM expressions inside whole-stage codegen;
    engine-specific hashes (xxhash64, crc32) are deliberately excluded
    from the contract because their bit-layout is not portable."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
        F.length("c_name").cast("bigint").alias("name_len"),
    ).orderBy("c_custkey")


@query(
    "window_ewma_bounded",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND user_id % 50 = 0 AND value IS NOT NULL
    )
    SELECT a.user_id, a.event_id,
           ROUND(SUM(b.value * 0.5 * power(0.5, a.rn - b.rn))
                 / (1 - power(0.5, COUNT(*))), 6) AS ewma
    FROM r a JOIN r b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 15 AND a.rn
    GROUP BY a.user_id, a.event_id
    ORDER BY a.user_id, a.event_id
    """,
)
def window_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-horizon exponentially-weighted moving average (α = 0.5,
    16-row horizon, partial-window renormalized) per user event series.

    True EWMA is a linear recurrence — inexpressible as a frame
    aggregate — so the engine uses the industry-standard bounded-horizon
    form: with α = 0.5 the dropped tail carries < 2⁻¹⁶ of the mass, and
    0.5-powers are exact in binary floating point, making the result
    engine-reproducible.  Spark shape: ONE window pass per user —
    ``collect_list`` over rowsBetween(-15, 0) then a higher-order
    ``aggregate`` over the (≤16-element) array, all JVM expressions.
    The oracle's equivalent self-join formulation is quadratic-in-
    horizon; the Spark plan is linear and keeps per-key state bounded
    at 16 rows — the property that matters when one key holds months
    of events.  The user_id % 50 slice keeps the oracle's self-join
    tractable at sf0.1; the Spark plan is slice-independent."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & (F.col("user_id") % 50 == 0)
        # NULL values would desynchronize the two formulations (collect_list
        # skips NULLs; the oracle's row join counts rows) — exclude them
        & F.col("value").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    xs = F.collect_list("value").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            xs.alias("xs"),
        )
        .select(
            "user_id",
            "event_id",
            F.round(
                F.expr(
                    "aggregate(zip_with(xs, sequence(size(xs) - 1, 0, -1),"
                    " (x, k) -> x * 0.5 * power(0.5D, k)), 0D, (acc, x) -> acc + x)"
                )
                / (1 - F.pow(F.lit(0.5), F.expr("size(xs)"))),
                6,
            ).alias("ewma"),
        )
        .orderBy("user_id", "event_id")
    )
