"""Row-level MERGE INTO semantics: update / delete / insert in one pass,
atomic swap of the target."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_source_etl_spark.sources import merge_into


def _write_target(spark, path):
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id BIGINT, tag STRING, amount DOUBLE",
    ).write.mode("overwrite").parquet(path)


def test_merge_update_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    source = spark.createDataFrame(
        [(2, "B", 200.0), (5, "e", 50.0)], "id BIGINT, tag STRING, amount DOUBLE"
    )
    out = merge_into(spark, path, source, ["id"])
    rows = {r["id"]: (r["tag"], r["amount"]) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0),
        2: ("B", 200.0),   # matched → updated
        3: ("c", 30.0),
        4: ("d", 40.0),
        5: ("e", 50.0),    # not matched → inserted
    }


def test_merge_delete_and_no_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    source = spark.createDataFrame(
        [(1, "A", -1.0), (3, "C", 300.0), (9, "z", 9.0)],
        "id BIGINT, tag STRING, amount DOUBLE",
    )
    out = merge_into(
        spark,
        path,
        source,
        ["id"],
        when_matched_delete=F.col("__src_amount") < 0,
        insert_not_matched=False,
    )
    rows = {r["id"]: (r["tag"], r["amount"]) for r in out.collect()}
    assert rows == {
        2: ("b", 20.0),
        3: ("C", 300.0),   # matched, not delete-flagged → updated
        4: ("d", 40.0),
    }  # id=1 deleted, id=9 not inserted


def test_merge_partial_update_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    source = spark.createDataFrame([(2, "B", 999.0)], "id BIGINT, tag STRING, amount DOUBLE")
    out = merge_into(
        spark,
        path,
        source,
        ["id"],
        when_matched_update={"tag": F.col("__src_tag")},  # amount untouched
    )
    rows = {r["id"]: (r["tag"], r["amount"]) for r in out.collect()}
    assert rows[2] == ("B", 20.0)
    # target survives the swap on disk (atomic rename committed)
    assert spark.read.parquet(path).count() == 4
