"""Join-strategy hints (user control over the physical join) and
PERMISSIVE CSV quarantine (malformed rows preserved, not dropped)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from open_source_etl_spark.catalog import load_table
from open_source_etl_spark.ingest.staging import read_csv_with_quarantine
from open_source_etl_spark.plans.inspect import formatted_plan


def _joined(spark, sf_dir, hint: str | None):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    if hint:
        orders = orders.hint(hint)
    return li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.sum("l_quantity").alias("q"), F.count("*").alias("n"))


def test_join_hints_pick_strategies(spark, sf_dir):
    merge_plan = formatted_plan(_joined(spark, sf_dir, "merge"))
    assert "SortMergeJoin" in merge_plan
    sh_plan = formatted_plan(_joined(spark, sf_dir, "shuffle_hash"))
    assert "ShuffledHashJoin" in sh_plan
    bc_plan = formatted_plan(_joined(spark, sf_dir, "broadcast"))
    assert "BroadcastHashJoin" in bc_plan


def test_join_hints_same_result(spark, sf_dir):
    rows = {
        hint: sorted(map(tuple, _joined(spark, sf_dir, hint).collect()))
        for hint in (None, "merge", "shuffle_hash", "broadcast")
    }
    base = rows[None]
    assert all(r == base for r in rows.values())


CSV_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", DoubleType())]
)


def test_csv_quarantine_split(spark, tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "feed.csv"), "w") as f:
        f.write("id,v\n1,1.5\n2,oops\nnot_a_number,3.0\n4,4.25\n")
    good, bad = read_csv_with_quarantine(spark, root, CSV_SCHEMA)
    good_rows = {(r["id"], r["v"]) for r in good.collect()}
    assert good_rows == {(1, 1.5), (4, 4.25)}
    bad_lines = sorted(r["_corrupt_record"] for r in bad.collect())
    assert bad_lines == ["2,oops", "not_a_number,3.0"]
    # exactly-once partition of the input lines
    assert good.count() + bad.count() == 4
