"""Custom Python DataSource and binaryFile ingestion surfaces."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from open_source_etl_spark.sources import SyntheticEventsSource, read_binary_files


def test_synthetic_source_deterministic(spark):
    spark.dataSource.register(SyntheticEventsSource)
    df = (
        spark.read.format("synthetic_events")
        .option("numRows", 500)
        .option("numPartitions", 8)
        .option("numUsers", 25)
        .load()
    )
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "user_id",
        "event_type",
        "value",
    ]
    # pure function of the row index: two reads agree exactly
    a = df.orderBy("event_id").collect()
    b = (
        spark.read.format("synthetic_events")
        .option("numRows", 500)
        .option("numPartitions", 3)  # partitioning must not change content
        .option("numUsers", 25)
        .load()
        .orderBy("event_id")
        .collect()
    )
    assert a == b
    stats = df.agg(
        F.countDistinct("user_id").alias("u"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    assert stats["u"] == 25
    assert 0.0 <= stats["lo"] <= stats["hi"] < 100.0


def test_binary_files_roundtrip(spark):
    root = tempfile.mkdtemp(prefix="osetl-bin-")
    payloads = {f"img_{i}.bin": bytes([i] * (10 + i)) for i in range(5)}
    for name, blob in payloads.items():
        with open(os.path.join(root, name), "wb") as f:
            f.write(blob)
    with open(os.path.join(root, "ignore.txt"), "w") as f:
        f.write("not binary payload")

    df = read_binary_files(spark, root, glob="*.bin")
    rows = df.select(
        F.element_at(F.split("path", "/"), -1).alias("name"), "length", "content"
    ).collect()
    assert {r["name"] for r in rows} == set(payloads)
    for r in rows:
        assert bytes(r["content"]) == payloads[r["name"]]
        assert r["length"] == len(payloads[r["name"]])
