"""Bloom runtime-filter guarantees: no false negatives (prefilter+join ==
plain join), bounded false-positive passthrough, and JVM-side hashing."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_etl_spark.catalog import load_table
from open_source_etl_spark.functions.bloom import bloom_prefilter, build_bloom


def test_bloom_no_false_negatives(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # a selective key set: urgent orders only
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    exact = li.join(keys, "l_orderkey").groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    filtered = bloom_prefilter(li, keys, "l_orderkey", fpp=0.01)
    via_bloom = filtered.join(keys, "l_orderkey").groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert exact == via_bloom


def test_bloom_selectivity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    total = li.count()
    match = li.join(keys, "l_orderkey", "left_semi").count()
    kept = bloom_prefilter(li, keys, "l_orderkey", fpp=0.01).count()
    # keeps every match, passes through at most ~fpp of the rest (with
    # generous slack for small-sample variance)
    assert kept >= match
    assert kept - match <= max(0.05 * (total - match), 50)


def test_bloom_empty_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    bits, k = build_bloom(keys, "l_orderkey")
    assert k >= 1
    # an empty key set may pass a sliver of hash-collision rows but must
    # never error; the join still returns zero rows
    assert bloom_prefilter(li, keys, "l_orderkey").join(keys, "l_orderkey").count() == 0


def test_bloom_unaligned_m_no_false_negatives(spark, sf_dir):
    """Regression: a key-set size whose theoretical bit count is NOT a
    multiple of 8 (n=93 -> m=891 before alignment) must still keep every
    true match — build and probe have to agree on the modulus."""
    cust = load_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_custkey") % 13 < 8).select("c_custkey").limit(93)
    n_keys = keys.count()
    kept = bloom_prefilter(cust, keys, "c_custkey").join(keys, "c_custkey").count()
    exact = cust.join(keys, "c_custkey").count()
    assert kept == exact, f"bloom dropped true matches: {kept} != {exact} (n={n_keys})"
