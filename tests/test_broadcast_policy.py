"""Size-aware broadcast policy (``functions/hints.maybe_broadcast``).

Supplier scales linearly with the data (~1 B rows at 100 TB), so its
broadcast hint must be conditional: applied while Catalyst's size estimate
is under the configured bound (fast bench fixtures), dropped past it (AQE
decides from runtime sizes — no forced OOM-sized build side).  Nation and
region are schema-bounded and keep unconditional hints
(VERDICT.md round 2, "What's wrong" #2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_etl_spark.catalog import load_table
from open_source_etl_spark.functions.hints import (
    DEFAULT_BOUND_BYTES,
    broadcast_bound_bytes,
    estimated_size_bytes,
    maybe_broadcast,
)
from open_source_etl_spark.plans.inspect import formatted_plan
from open_source_etl_spark.registry import all_queries


def _supplier_join(spark, sf_dir, bound=None):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return li.join(maybe_broadcast(sup, bound), li.l_suppkey == sup.s_suppkey)


def test_hint_applies_under_bound(spark, sf_dir):
    plan = formatted_plan(_supplier_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_hint_disappears_past_bound(spark, sf_dir):
    """Past the bound the frame must carry NO hint: with AQE's own
    threshold forced to -1 the join degrades to a shuffle join, proving
    the forced hint is gone (a hinted frame would still broadcast)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(_supplier_join(spark, sf_dir, bound=1))
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bound_configurable_per_session(spark):
    assert broadcast_bound_bytes(spark) == DEFAULT_BOUND_BYTES
    spark.conf.set("spark.osetl.broadcast.maxBytes", "1")
    try:
        assert broadcast_bound_bytes(spark) == 1
        df = spark.range(10).withColumn("v", F.lit("x"))
        assert "ResolvedHint" not in maybe_broadcast(df)._jdf.queryExecution().logical().toString()
    finally:
        spark.conf.unset("spark.osetl.broadcast.maxBytes")


def test_estimate_is_real(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    est = estimated_size_bytes(sup)
    assert est is not None and est > 0


def test_q5_still_broadcasts_at_fixture_scale(spark, sf_dir):
    """At bench scale supplier sits far under the bound, so the q* plans
    keep their broadcast joins — the policy changes behavior only past
    the bound, never at fixture sizes (PLANS.md counts stay stable)."""
    from open_source_etl_spark.plans.inspect import broadcast_join_count

    df = all_queries()["q5_local_supplier_volume"](spark, sf_dir)
    assert broadcast_join_count(df) >= 3
