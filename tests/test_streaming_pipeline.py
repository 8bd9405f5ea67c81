"""Streaming ingestion pipeline: continuous CSV → date-partitioned
parquet landing (the reference DAG's sense+copy collapsed into one
declaration; streaming/pipelines.py)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from open_source_etl_spark.streaming.pipelines import (
    stream_csv_to_partitioned_parquet,
)

SCHEMA = StructType(
    [
        StructField("data_id", StringType()),
        StructField("round", StringType()),
        StructField("date", StringType()),
        StructField("home", StringType()),
        StructField("away", StringType()),
    ]
)


@pytest.fixture()
def csv_source(tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "scores_a.csv").write_text(
        "data_id,round,date,home,away\n"
        "0,Regular Season,2021-03-06,FCB,BVB\n"
        "1,Regular Season,2021-03-07,S04,RBL\n"
    )
    (src / "scores_b.csv").write_text(
        "data_id,round,date,home,away\n"
        "2,Regular Season,2021-04-10,FCB,S04\n"
    )
    return str(src)


def test_stream_lands_date_partitioned(spark, csv_source, tmp_path):
    landing = str(tmp_path / "landing")
    out = stream_csv_to_partitioned_parquet(
        spark, csv_source, landing, SCHEMA, date_column="date"
    )
    rows = {r.data_id: r for r in out.collect()}
    assert set(rows) == {"0", "1", "2"}
    # content-derived partitions, reference month naming (lowercase %B)
    assert (rows["0"].year, rows["0"].month, rows["0"].day) == (2021, "march", 6)
    assert (rows["2"].year, rows["2"].month, rows["2"].day) == (2021, "april", 10)
    # Hive layout on disk → partition pruning for every downstream reader
    import glob

    assert glob.glob(f"{landing}/year=2021/month=march/day=7/*.parquet")
    # incremental discovery: a late file lands on re-run without reprocessing
    pruned = spark.read.parquet(landing).where("month = 'april'")
    assert pruned.count() == 1


def test_stream_upsert_processes_only_the_delta(spark, tmp_path):
    """Exactly-once incremental ingestion: a second invocation with the
    same checkpoint sees only files that arrived since the first."""
    from open_source_etl_spark.streaming.pipelines import stream_upsert_partitions

    src = tmp_path / "arrivals"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    (src / "day1.csv").write_text(
        "data_id,round,date,home,away\n0,R,2021-03-06,FCB,BVB\n"
    )
    stream_upsert_partitions(spark, str(src), store, SCHEMA, ckpt)
    assert {r.data_id for r in spark.read.parquet(store).collect()} == {"0"}

    # a corrected re-send for march 6 plus a new day arrive later
    (src / "day1_fix.csv").write_text(
        "data_id,round,date,home,away\n10,R,2021-03-06,FCB,S04\n"
    )
    (src / "day2.csv").write_text(
        "data_id,round,date,home,away\n1,R,2021-04-07,RBL,BVB\n"
    )
    stream_upsert_partitions(spark, str(src), store, SCHEMA, ckpt)
    rows = {r.data_id: (r.year, r.month, r.day) for r in spark.read.parquet(store).collect()}
    # march 6 partition was overwritten by the delta batch (old row gone),
    # april 7 landed new — day1.csv was NOT reprocessed
    assert rows == {"10": (2021, "march", 6), "1": (2021, "april", 7)}
