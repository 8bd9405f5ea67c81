"""Salting transforms are semantics-preserving (functions/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_etl_spark.catalog import load_table
from open_source_etl_spark.functions.skew import (
    key_skew_profile,
    salted_aggregate,
    salted_broadcast_join,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.count("l_orderkey").alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "qty": ("l_quantity", "sum"),
            "n": ("l_orderkey", "count"),
            "lo": ("l_extendedprice", "min"),
            "hi": ("l_extendedprice", "max"),
        },
    )
    cols = ["l_returnflag", "n", "lo", "hi"]
    assert _rows(plain, cols) == _rows(salted, cols)
    # float sums compare to 1e-6 relative (salting reorders the adds)
    p = {r.l_returnflag: r.qty for r in plain.collect()}
    s = {r.l_returnflag: r.qty for r in salted.collect()}
    assert all(abs(p[k] - s[k]) <= 1e-6 * abs(p[k]) for k in p)


def test_salted_broadcast_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = orders.join(cust, "c_custkey")
    salted = salted_broadcast_join(orders, cust, "c_custkey")
    cols = ["o_orderkey", "c_custkey", "c_name"]
    assert _rows(plain, cols) == _rows(salted, cols)
    assert sorted(plain.columns) == sorted(salted.columns)


def test_key_skew_profile_shape(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    prof = key_skew_profile(ev, "event_type", top=3)
    rows = prof.collect()
    assert len(rows) == 3
    assert rows[0].n_rows >= rows[-1].n_rows
    assert 0 < rows[0].share <= 1
