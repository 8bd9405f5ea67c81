"""Sort / limit / top-k.

Provenance: LIMIT/first-row is REF #1 (the reference's metadata point
lookup takes the first row of a result, `dags/…:44`); multi-key ORDER BY
is GEN (SURVEY.md §2B "Sort / limit / top-k").

Scale notes: a global ORDER BY is a range-partitioned shuffle (sampled
boundaries) — fine for presentation-sized outputs; `ORDER BY + LIMIT k`
is optimized by Spark into TakeOrderedAndProject (per-partition top-k,
then merge of k·partitions rows on the driver) and never materializes a
full sort at scale. LIMIT queries pin a total order including a unique
tie-break column so the selected row SET is deterministic — without it
the result is engine- and run-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "sort_multikey_nulls",
    oracle="""
    SELECT
      c.c_custkey,
      c.c_mktsegment,
      o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON o.o_custkey = c.c_custkey
    ORDER BY c.c_mktsegment DESC, o.o_totalprice ASC NULLS LAST, c.c_custkey
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST (Spark defaults NULLS FIRST
    on ASC, DuckDB NULLS LAST — always pin, SURVEY.md §7 risks)."""
    cust = load_table(spark, sf_dir, "customer")
    pend = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pend, pend.o_custkey == cust.c_custkey, "left")
        .select("c_custkey", "c_mktsegment", "o_totalprice")
        .orderBy(
            F.col("c_mktsegment").desc(),
            F.col("o_totalprice").asc_nulls_last(),
            "c_custkey",
        )
    )


@query(
    "limit_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (TakeOrderedAndProject; unique tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "limit_offset_page",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    ORDER BY c_custkey
    LIMIT 20 OFFSET 40
    """,
)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: LIMIT/OFFSET over a pinned total order."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_name").orderBy("c_custkey").offset(40).limit(20)
