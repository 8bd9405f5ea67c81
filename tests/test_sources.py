"""Source/sink surface: bucketed co-located joins and dynamic partition
overwrite (sources/)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_source_etl_spark.catalog import load_table
from open_source_etl_spark.plans import exchange_count
from open_source_etl_spark.sources import (
    bucketed_join,
    overwrite_partitions,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the test proves bucketing, not broadcast."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "t_li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "t_ord_bucketed", "l_orderkey", n_buckets=8)
    try:
        joined = bucketed_join(spark, "t_li_bucketed", "t_ord_bucketed", "l_orderkey")
        # co-located layout satisfies the join's distribution requirement:
        # the per-query shuffle is gone (paid once at write time)
        assert exchange_count(joined) == 0
        plain = li.join(orders, "l_orderkey")
        assert exchange_count(plain) >= 2
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_dynamic_partition_overwrite_preserves_siblings(spark, tmp_path):
    path = str(tmp_path / "landed")
    base = spark.createDataFrame(
        [
            (1, dt.date(2021, 3, 6), "a"),
            (2, dt.date(2021, 4, 7), "b"),
        ],
        "id long, d date, v string",
    ).select("id", "v", F.year("d").alias("year"), F.month("d").alias("month"))
    write_partitioned(base, path, ["year", "month"])

    # re-land ONLY march with corrected data
    fixed = spark.createDataFrame(
        [(1, dt.date(2021, 3, 6), "a2"), (9, dt.date(2021, 3, 20), "new")],
        "id long, d date, v string",
    ).select("id", "v", F.year("d").alias("year"), F.month("d").alias("month"))
    overwrite_partitions(fixed, path, ["year", "month"])

    out = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    # march replaced (old id=1/'a' gone), april untouched
    assert out == {(1, "a2"), (9, "new"), (2, "b")}
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"
    )


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    from open_source_etl_spark.sources import compact_parquet

    path = str(tmp_path / "fragmented")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(24).write.parquet(path)  # simulate small-file accretion
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 24
    n = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after == n < before
    assert spark.read.parquet(path).count() == li.count()


def test_jsonl_quarantine_partitions_input_exactly_once(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from open_source_etl_spark.sources.readers import read_jsonl_with_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": "not-a-number", "name": "bad-type"}\n'
        '{"id": 3, "name": "ok2"}\n'
        "{truncated\n"
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    good, bad = read_jsonl_with_quarantine(spark, str(p), schema)
    assert good.count() == 2
    assert sorted(r.id for r in good.collect()) == [1, 3]
    bad_lines = [r[0] for r in bad.collect()]
    assert len(bad_lines) == 2
    # raw text preserved for replay
    assert any("not-a-number" in b for b in bad_lines)
    assert any("truncated" in b for b in bad_lines)


def test_analyze_table_stats_feeds_cbo(spark, sf_dir):
    from open_source_etl_spark.catalog import load_table
    from open_source_etl_spark.sources.readers import analyze_table_stats

    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "stats_nation"
    )
    stats = analyze_table_stats(spark, "stats_nation", ["n_nationkey", "n_name"])
    assert "statistics" in stats and "rows" in stats["statistics"]
    spark.sql("DROP TABLE stats_nation")


def test_bucketed_query_leaves_warehouse_empty(spark, sf_dir):
    """join_bucketed_colocated drops its uuid-tagged managed tables in a
    finally block; nothing of them may survive in the warehouse dir (a
    leftover directory from a killed run once wedged later runs on
    LOCATION_ALREADY_EXISTS — VERDICT.md round 2, hygiene #3)."""
    import os
    from urllib.parse import urlparse

    from open_source_etl_spark.registry import all_queries

    all_queries()["join_bucketed_colocated"](spark, sf_dir).collect()
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    leftovers = (
        [d for d in os.listdir(wh) if d.startswith(("q_li_bucketed", "q_ord_bucketed"))]
        if os.path.isdir(wh)
        else []
    )
    assert leftovers == []


def test_schema_cache_detects_rewritten_path(spark, tmp_path):
    """The memoized schema inference in catalog.load_table must key on a
    file fingerprint, not the bare path: perturb tooling rewrites fixed
    temp paths, and fixture drops have changed physical types in place
    (ADVICE round 4).  A rewritten table at the same path must be read
    with its NEW schema, not a stale cached one."""
    sf_dir = str(tmp_path)
    p = f"{sf_dir}/events.parquet"
    spark.createDataFrame([(1, "a")], "id long, payload string").write.parquet(p)
    first = load_table(spark, sf_dir, "events")
    assert dict(first.dtypes) == {"id": "bigint", "payload": "string"}

    # rewrite in place with a different schema (and bump mtime to cover
    # same-size same-second filesystems)
    import os
    import shutil
    import time

    shutil.rmtree(p)
    spark.createDataFrame(
        [(2, 3.5, "b")], "id long, score double, payload string"
    ).write.parquet(p)
    os.utime(p, ns=(time.time_ns(), time.time_ns() + 1))

    second = load_table(spark, sf_dir, "events")
    assert dict(second.dtypes) == {
        "id": "bigint",
        "score": "double",
        "payload": "string",
    }
    assert second.count() == 1
