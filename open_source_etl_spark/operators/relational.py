"""Relational core: scans, filters, projections, scalar functions.

Reference provenance (SURVEY.md §2A):
- point lookup / equality filter — `dags/ingest_bundesliga_match_scores.py:36-45`
- LIKE-prefix predicate — `dags/…:153`
- set membership — GE expectations `…data_expectations.json:27-54`
- DISTINCT — `dags/…:152`
- positional projection + rename + varchar cast (staging DDL) — `dags/…:170-188`
- string/date scalar functions — `dags/…:82,136,148`, `partitioner.py:13-22`

All built-in `pyspark.sql.functions` (JVM, whole-stage codegen); no UDFs.
Filters/projections on Parquet scans push down via Catalyst — at 100 TB the
scan reads only the referenced columns and prunes row groups on the
predicate, so these stay IO-bound on exactly the needed bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_compute
from ..functions.parity import davg, dsum, sql_davg, sql_dsum
from ..registry import query


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity', 'DECIMAL(8,2)')} AS sum_qty,
      {sql_dsum('l_extendedprice', 'DECIMAL(8,2)')} AS sum_base_price,
      {sql_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(28,6)')} AS sum_disc_price,
      {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'DECIMAL(28,6)')} AS sum_charge,
      ROUND({sql_davg('l_quantity', 'DECIMAL(8,2)')}, 4) AS avg_qty,
      ROUND({sql_davg('l_extendedprice', 'DECIMAL(8,2)')}, 4) AS avg_price,
      ROUND({sql_davg('l_discount', 'DECIMAL(8,2)')}, 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary (scan→filter→hash-agg→sort).

    The full pipeline the reference delegates to Snowflake, run natively:
    partial aggregation map-side, single shuffle on the 6-value group key,
    sort of a 6-row result — the plan that scales to 100 TB unchanged.
    Widened scan: eight decimal aggregates per row is enough per-row work
    that fanning the single-split fixture out repays the exchange.
    """
    li = load_table_compute(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # no presentation rounding on the sums: the decimal interior is
            # exact and its cast to double is deterministic on both engines,
            # while round(x, 2) could hit an exact .005 boundary where
            # Spark (shortest-repr HALF_UP) and DuckDB (binary value) differ.
            # Plain 2dp columns sum at DECIMAL(8,2): still exact (no value
            # rounds), and the p+10=18 sum buffer stays on Spark's
            # Long-backed decimal fast path — ~2x the BigDecimal route the
            # wider product sums below must take.
            dsum("l_quantity", "decimal(8,2)").alias("sum_qty"),
            dsum("l_extendedprice", "decimal(8,2)").alias("sum_base_price"),
            dsum(disc_price, "decimal(28,6)").alias("sum_disc_price"),
            dsum(charge, "decimal(28,6)").alias("sum_charge"),
            F.round(davg("l_quantity", "decimal(8,2)"), 4).alias("avg_qty"),
            F.round(davg("l_extendedprice", "decimal(8,2)"), 4).alias("avg_price"),
            F.round(davg("l_discount", "decimal(8,2)"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "filter_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey = 42
    """,
)
def filter_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality point lookup (reference metadata read, `dags/…:36-45`)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "filter_like_prefix",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE 's%' AND p_brand = 'Brand#1'
    ORDER BY p_partkey
    """,
)
def filter_like_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-prefix + equality conjunction (reference colmap lookup, `dags/…:152-157`)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("s") & (F.col("p_brand") == "Brand#1"))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@query(
    "filter_in_set",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus NOT IN ('P')
    ORDER BY o_orderkey
    """,
)
def filter_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set membership / NOT IN (GE value-set expectations, `…json:27-54`)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & ~F.col("o_orderstatus").isin("P")
        )
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "filter_range_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    ORDER BY l_orderkey, l_linenumber
    """,
)
def filter_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/BETWEEN conjunction (TPC-H-Q6-shaped predicate set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between("1996-01-01", "1996-12-31")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "filter_null_predicates",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(CASE WHEN text IS NOT NULL THEN 1 END) AS n_text,
      COUNT(CASE WHEN NULLIF(lang, 'zh') IS NULL THEN 1 END) AS n_zh_or_null
    FROM documents
    """,
)
def filter_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL predicates + NULLIF (GE not-null expectations, `…json:55-96`)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("text").isNotNull(), 1)).alias("n_text"),
        F.count(F.when(F.nullif(F.col("lang"), F.lit("zh")).isNull(), 1)).alias("n_zh_or_null"),
    )


@query(
    "distinct_values",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (reference colmap DISTINCT, `dags/…:152`)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@query(
    "project_rename_cast",
    oracle="""
    SELECT
      o_orderkey AS order_id,
      CAST(o_orderkey AS VARCHAR) AS order_id_str,
      CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
      printf('%.2f', o_totalprice) AS total_price_str,
      CAST(FLOOR(o_totalprice) AS BIGINT) AS total_price_int
    FROM orders
    ORDER BY o_orderkey
    """,
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + casts (staging DDL semantics, `dags/…:170-188`).

    The reference stages every column as varchar; here the cast family is
    exercised both directions. Doubles go through printf so both engines
    format identically; Spark's double→bigint cast truncates while DuckDB
    rounds, so the oracle floors explicitly.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderkey").cast("string").alias("order_id_str"),
            # date→timestamp round-trip: a bare DATE output materializes as
            # datetime.date (Spark) vs datetime64 (DuckDB) in the driver's
            # pandas canonicalizer and hash-mismatches
            F.col("o_orderdate").cast("date").cast("timestamp").alias("order_date"),
            F.format_string("%.2f", F.col("o_totalprice")).alias("total_price_str"),
            F.col("o_totalprice").cast("bigint").alias("total_price_int"),
        )
        .orderBy("order_id")
    )


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT
      p_partkey,
      UPPER(p_brand) AS brand_upper,
      LOWER(p_type) AS type_lower,
      CONCAT_WS('/', p_brand, p_type) AS brand_type,
      SUBSTRING(p_name, 1, 5) AS name_prefix,
      LENGTH(p_name) AS name_len,
      TRIM(p_name) AS name_trim,
      LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      REPLACE(p_type, ' ', '_') AS type_snake,
      regexp_extract(p_name, '^[a-z]+') AS first_word,
      split_part(p_type, ' ', 1) AS type_head
    FROM part
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (reference: concat `dags/…:82`, split `:136,148`,
    lower `partitioner.py:15`, prefix `:153`)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.trim("p_name").alias("name_trim"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        )
        .orderBy("p_partkey")
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      EXTRACT(YEAR FROM o_orderdate) AS order_year,
      EXTRACT(MONTH FROM o_orderdate) AS order_month,
      EXTRACT(DAY FROM o_orderdate) AS order_day,
      strftime(o_orderdate, '%Y-%m-%d') AS order_ymd,
      date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
      CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date,
      CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS TIMESTAMP) AS month_start
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (reference partition math, `partitioner.py:13-22`)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_ymd"),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_2002"
            ),
            F.date_add(F.col("o_orderdate").cast("date"), 30)
            .cast("timestamp")
            .alias("due_date"),
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .cast("timestamp")
            .alias("month_start"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
      ABS(l_quantity - 25) AS qty_dev,
      CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
      CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
      ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
      ROUND(POW(1 + l_tax, 2), 6) AS tax_sq,
      CAST(l_orderkey % 97 AS BIGINT) AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 400
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family over pricing arithmetic (SURVEY.md §2B scalar table)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 400)
        .select(
            "l_orderkey",
            "l_linenumber",
            # round at scale 4: the product's exact decimal content is ≤4
            # digits (2-decimal price × 2-decimal discount), so no halfway
            # mass exists at this scale — Spark's shortest-repr HALF_UP and
            # DuckDB's binary-value rounding agree (see functions/parity.py)
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
            F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
            (F.col("l_orderkey") % 97).cast("bigint").alias("key_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice >= 300000 THEN 'high'
        WHEN o_totalprice >= 100000 THEN 'mid'
        ELSE 'low'
      END AS price_band,
      COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
      CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    ORDER BY o_orderkey
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif (GEN of the NOT-NULL checks §2A.3)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, "high")
            .when(F.col("o_totalprice") >= 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
                "status_norm"
            ),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_regex_funcs",
    # Java regex (Spark) and RE2 (DuckDB) agree on this \w/\d/literal
    # subset; DuckDB needs the 'g' flag to match Spark's replace-all
    oracle="""
    SELECT doc_id,
      regexp_extract(text, '^(\\w+)', 1) AS first_token,
      CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
      regexp_replace(text, '\\d+', '#', 'g') AS no_digits,
      split_part(text, ' ', 2) AS second_token
    FROM documents
    ORDER BY doc_id
    LIMIT 100
    """,
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: extract (capture group), count, replace-all,
    and positional split — all JVM-side codegen'd expressions, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.regexp_extract("text", r"^(\w+)", 1).alias("first_token"),
            F.size(F.expr(r"regexp_extract_all(text, '[aeiou]', 0)"))
            .cast("bigint")
            .alias("n_vowels"),
            F.regexp_replace("text", r"\d+", "#").alias("no_digits"),
            F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("second_token"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


@query(
    "filter_null_safe_eq",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM
                    NULLIF(l_linestatus, 'O') THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
      CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') = NULLIF(l_linestatus, 'O')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq
    FROM lineitem
    """,
)
def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (``<=>`` / IS NOT DISTINCT FROM): NULL <=> NULL
    is TRUE where plain ``=`` yields NULL and drops the row — the
    operator join keys need when NULLs must match (SCD2 change
    detection uses the same semantics).  Two derived nullable columns
    make the three-valued-logic difference visible in one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.nullif(F.col("l_returnflag"), F.lit("N"))
    y = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return li.agg(
        F.count("*").alias("n_rows"),
        F.sum(x.eqNullSafe(y).cast("int")).alias("n_nullsafe_eq"),
        F.sum(F.when(x == y, 1).otherwise(0)).alias("n_plain_eq"),
    )


@query(
    "scalar_try_arith",
    oracle="""
    SELECT
      o_orderkey,
      CASE WHEN o_orderkey % 5 = 0 THEN NULL
           ELSE o_totalprice / (o_orderkey % 5) END AS price_ratio,
      TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
      TRY_CAST(o_orderstatus AS INTEGER) AS status_num
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic (``try_divide`` / ``try_cast``): under Spark
    4's ANSI mode, division by zero and bad casts THROW — the try_
    family yields NULL instead, the semantics a 100 TB batch job needs
    so one malformed row can't kill hours of work.  The oracle encodes
    the same NULL-on-failure contract with CASE/TRY_CAST."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.try_divide(
                F.col("o_totalprice"), (F.col("o_orderkey") % 5).cast("double")
            ).alias("price_ratio"),
            F.expr(
                "try_cast(substring(o_orderpriority, 1, 1) AS INT)"
            ).alias("priority_num"),
            F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_url_funcs",
    # the oracle reconstructs host/path/query extraction with string ops —
    # same RESULT as Spark's parse_url, different mechanism
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang
               || '?doc=' || doc_id || '&v=2' AS url
      FROM documents
      WHERE doc_id < 200 AND lang IS NOT NULL AND source IS NOT NULL
    )
    SELECT
      doc_id,
      url,
      split_part(split_part(url, '://', 2), '/', 1) AS host,
      '/' || split_part(split_part(url, '://', 2), '/', 2) || '/'
          || split_part(split_part(split_part(url, '://', 2), '/', 3), '?', 1)
        AS path,
      split_part(split_part(url, 'doc=', 2), '&', 1) AS doc_param
    FROM u
    ORDER BY doc_id
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (``parse_url`` HOST/PATH/QUERY-param): the
    provenance-extraction step of every web-corpus pipeline (group by
    host for per-domain quotas, dedup by normalized path).  Spark's
    parse_url runs JVM-side; the oracle reconstructs the same fields
    with split_part string surgery, so the check is on results, not
    the mechanism.

    NULL components are excluded before parsing: a NULL lang/source makes
    the whole concat NULL, where Spark's parse_url(NULL) → NULL but
    DuckDB's split_part(NULL) → '' — undefined inputs must not reach the
    divergent code paths."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200)
        & F.col("lang").isNotNull()
        & F.col("source").isNotNull()
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("?doc="), F.col("doc_id"), F.lit("&v=2"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("doc")).alias("doc_param"),
    ).orderBy("doc_id")
