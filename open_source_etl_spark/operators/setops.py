"""Set operations: UNION ALL / UNION / INTERSECT / EXCEPT (+ ALL variants).

Provenance: UNION ALL is REF #12 — the reference's first dbt model is
literally `SELECT 1 UNION ALL SELECT NULL`
(`data_transformations/models/example/my_first_dbt_model.sql:10-21`);
the rest of the family is GEN (SURVEY.md §2B "Set operations").

Scale notes: UNION ALL is a free concatenation (no shuffle); the
DISTINCT/INTERSECT/EXCEPT variants hash-shuffle on the full row — keep
the projections narrow before applying them, as done here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "setop_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS priority_class
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    ORDER BY o_orderkey
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL concatenation (reference dbt model #12 semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority_class")
    )
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority_class")
    )
    return urgent.unionByName(high).orderBy("o_orderkey")


@query(
    "setop_union_distinct",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT user_id FROM events WHERE event_type = 'signup'
    )
    ORDER BY custkey
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics across two sources."""
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = ev.filter(F.col("event_type") == "signup").select(F.col("user_id").alias("custkey"))
    return a.union(b).distinct().orderBy("custkey")


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    ORDER BY custkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both years."""
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = orders.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.intersect(y97).orderBy("custkey")


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    ORDER BY custkey
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who never ordered."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    buyers = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return cust.exceptAll(buyers.distinct()).distinct().orderBy("custkey")


@query(
    "setop_except_all",
    oracle="""
    SELECT x AS status FROM (
      SELECT o_orderstatus AS x FROM orders
      EXCEPT ALL
      SELECT o_orderstatus FROM orders WHERE o_orderpriority = '5-LOW'
    )
    ORDER BY status
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference preserving multiplicity."""
    orders = load_table(spark, sf_dir, "orders")
    all_status = orders.select(F.col("o_orderstatus").alias("status"))
    low_status = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_orderstatus").alias("status")
    )
    return all_status.exceptAll(low_status).orderBy("status")


@query(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset): each nation key kept min(#customers,
    #suppliers) times — the duplicate-preserving variant ``intersect``
    collapses.  Same single hash shuffle on the (narrow) projected row as
    the distinct form; the multiplicity bookkeeping is in the hash
    aggregate, not an extra exchange."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersectAll(supp).orderBy("nationkey")


@query(
    "setop_union_schema_evolution",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey AS order_key, o_orderstatus AS status,
             o_totalprice AS totalprice, NULL AS priority
      FROM orders WHERE o_orderkey <= 1000
      UNION ALL BY NAME
      SELECT o_orderkey AS order_key, o_orderstatus AS status,
             NULL AS totalprice, o_orderpriority AS priority
      FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000
    )
    ORDER BY order_key
    """,
)
def setop_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution UNION (``unionByName(allowMissingColumns=True)``):
    an old batch without ``priority`` appends to a new batch without
    ``totalprice``; absent columns fill with NULL by NAME, not position —
    the semantics every long-lived ingestion needs the day a field is
    added, where positional unionAll would silently misalign columns."""
    orders = load_table(spark, sf_dir, "orders")
    old_batch = orders.filter(F.col("o_orderkey") <= 1000).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )
    new_batch = orders.filter(
        (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 2000)
    ).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True).orderBy(
        "order_key"
    )
