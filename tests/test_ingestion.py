"""Ingestion layer: partition math, metadata store, CSV staging, full DAG.

Models the reference's semantics directly (partition strings vs
`partitioner.py:7-25`, metadata protocol vs `dags/…:35-120`, staging vs
`dags/…:145-206`).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from open_source_etl_spark.ingest import (
    MetadataStore,
    infer_csv_schema,
    partition_suffix,
    register_staging_view,
    stage_csv,
)
from open_source_etl_spark.ingest.partitioner import partition_columns
from open_source_etl_spark.ingest.pipeline import run_ingestion
from open_source_etl_spark.ingest.staging import resolve_columns


@pytest.mark.parametrize(
    ("date", "expected"),
    [
        (dt.date(2021, 3, 7), "2021/march/7/"),
        (dt.date(1999, 12, 31), "1999/december/31/"),
        (dt.date(2024, 1, 1), "2024/january/1/"),  # no zero padding, like the ref
    ],
)
def test_partition_suffix_matches_reference_semantics(date, expected):
    assert partition_suffix(date) == expected


def test_partition_columns_match_suffix(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("2021-03-07",)], "d string").select(
        *partition_columns(F.col("d").cast("date"))
    )
    row = df.first()
    assert (row["year"], row["month"], row["day"]) == (2021, "march", 7)


@pytest.fixture()
def csv_dir(tmp_path):
    """A reference-shaped CSV batch: header + pandas-style unnamed index."""
    p = tmp_path / "raw"
    p.mkdir()
    (p / "bundesliga_match_scores_2021.csv").write_text(
        ",round,day,date,home,score,away,attendance,venue\n"
        "0,Regular Season,Sat,2021-03-06,FCB,3-1,BVB,100,Allianz\n"
        "1,Regular Season,Sun,2021-03-07,S04,0-2,RBL,50,Veltins\n"
    )
    return str(p)


def test_infer_csv_schema_renames_index(spark, csv_dir):
    cols = infer_csv_schema(spark, csv_dir + "/*.csv")
    assert cols[0] == "data_id"  # 'Unnamed: 0'/'' index column renamed
    assert "round" in cols and "venue" in cols


def test_colmap_resolution_preferred_over_inference(spark, csv_dir):
    colmap = spark.createDataFrame(
        [
            ("bundesliga", "t_bundesliga_external", "data_id"),
            ("bundesliga", "t_bundesliga_external", "round"),
            ("bundesliga", "t_other", "nope"),
        ],
        "s3_file_name_wc string, snowflake_table_name string, snowflake_table_column_name string",
    )
    cols = resolve_columns(
        spark,
        csv_dir + "/*.csv",
        "t_bundesliga_external",
        colmap=colmap,
        file_prefix="bundesliga",
    )
    assert cols == ["data_id", "round"]
    # no colmap rows -> falls back to header inference (ref §1.3 behavior)
    cols2 = resolve_columns(
        spark, csv_dir + "/*.csv", "t_missing", colmap=colmap, file_prefix="zzz"
    )
    assert cols2[0] == "data_id"


def test_staging_view_is_all_string(spark, csv_dir):
    cols = infer_csv_schema(spark, csv_dir + "/*.csv")
    df = register_staging_view(spark, csv_dir + "/*.csv", "bundesliga", cols)
    assert all(t == "string" for _, t in df.dtypes)
    assert spark.table("t_bundesliga_external").count() == 2


def test_stage_csv_partitions_by_run_date(spark, csv_dir, tmp_path):
    landing = str(tmp_path / "landing")
    out = stage_csv(
        spark, csv_dir + "/*.csv", landing, date_column="date", run_date=dt.date(2021, 3, 7)
    )
    assert out.count() == 2
    # hive layout with the reference's lowercase month name
    assert os.path.isdir(os.path.join(landing, "year=2021", "month=march", "day=7"))


def test_stage_csv_partitions_by_content(spark, csv_dir, tmp_path):
    landing = str(tmp_path / "landing2")
    out = stage_csv(spark, csv_dir + "/*.csv", landing, date_column="date", run_date=None)
    assert out.count() == 2
    assert os.path.isdir(os.path.join(landing, "year=2021", "month=march", "day=6"))
    assert os.path.isdir(os.path.join(landing, "year=2021", "month=march", "day=7"))


def test_metadata_store_roundtrip(spark, tmp_path):
    store = MetadataStore(spark, str(tmp_path / "meta"))
    assert store.get_key_type("bundesliga_match_scores") is None
    store.upsert("bundesliga_match_scores", key_type="transactional")
    assert store.get_key_type("bundesliga_match_scores") == "transactional"
    value = store.set_partition_value("bundesliga_match_scores", "2021/march/7/")
    assert value == "transactional/bundesliga_match_scores/2021/march/7/"
    assert store.get_value("bundesliga_match_scores") == value
    # upsert preserves other keys
    store.upsert("laliga_match_scores", key_type="transactional")
    assert store.get_key_type("bundesliga_match_scores") == "transactional"
    assert store.read().count() == 2


def test_run_ingestion_end_to_end(spark, csv_dir, tmp_path):
    store = MetadataStore(spark, str(tmp_path / "meta"))
    store.upsert("bundesliga_match_scores", key_type="transactional")
    result = run_ingestion(
        spark,
        entity="bundesliga_match_scores",
        source_glob=csv_dir + "/*.csv",
        landing_root=str(tmp_path / "landing"),
        metadata=store,
        run_date=dt.date(2021, 3, 7),
    )
    assert result is not None
    assert result.staged_rows == 2
    assert result.partition_value == "transactional/bundesliga_match_scores/2021/march/7/"
    assert spark.table(result.staging_view).count() == 2
    # sensor soft-fail path: no files -> None
    assert (
        run_ingestion(
            spark,
            entity="bundesliga_match_scores",
            source_glob=str(tmp_path / "empty") + "/*.csv",
            landing_root=str(tmp_path / "landing"),
            metadata=store,
            run_date=dt.date(2021, 3, 7),
        )
        is None
    )


def test_migration_example_runs_end_to_end(tmp_path):
    """examples/migrate_reference_pipeline.py is the reference user's
    documented switch-over path — keep it runnable."""
    import runpy
    import sys

    argv = sys.argv
    sys.argv = ["migrate_reference_pipeline.py", str(tmp_path / "wd")]
    try:
        runpy.run_path(
            "examples/migrate_reference_pipeline.py", run_name="__main__"
        )
    finally:
        sys.argv = argv

def test_sensor_retry_and_soft_fail_semantics(tmp_path, monkeypatch):
    """Reference S3KeySensor knobs (dags/...:55-66): poll every
    poke_interval until timeout -> soft-fail []; ERRORS consume retries
    then re-raise.  Driven with a fake clock - no real sleeping."""
    from open_source_etl_spark.ingest import pipeline as pl

    policy = pl.RetryPolicy(
        sensor_timeout=180.0, sensor_poke_interval=30.0, sensor_retries=2
    )

    class FakeTime:
        def __init__(self):
            self.now = 0.0
        def clock(self):
            return self.now
        def sleep(self, s):
            self.now += s

    # (a) file appears on the 3rd poke -> sensed without timing out
    ft = FakeTime()
    calls = {"n": 0}
    def appears_late(pattern, spark=None):
        calls["n"] += 1
        return ["f.csv"] if calls["n"] >= 3 else []
    monkeypatch.setattr(pl, "sense_files", appears_late)
    got = pl.sense_files_with_retry("x/*.csv", None, policy, ft.clock, ft.sleep)
    assert got == ["f.csv"] and ft.now == 60.0

    # (b) never appears -> polls until timeout, soft-fails to []
    ft = FakeTime()
    monkeypatch.setattr(pl, "sense_files", lambda p, s=None: [])
    assert pl.sense_files_with_retry("x/*.csv", None, policy, ft.clock, ft.sleep) == []
    assert ft.now >= 180.0

    # (c) flaky source: 2 errors are retried, 3rd attempt succeeds
    ft = FakeTime()
    calls = {"n": 0}
    def flaky(pattern, spark=None):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("transient store error")
        return ["f.csv"]
    monkeypatch.setattr(pl, "sense_files", flaky)
    assert pl.sense_files_with_retry("x/*.csv", None, policy, ft.clock, ft.sleep) == ["f.csv"]

    # (d) errors beyond the retry budget re-raise
    ft = FakeTime()
    def always_broken(pattern, spark=None):
        raise OSError("hard store error")
    monkeypatch.setattr(pl, "sense_files", always_broken)
    with pytest.raises(OSError, match="hard store error"):
        pl.sense_files_with_retry("x/*.csv", None, policy, ft.clock, ft.sleep)


def test_run_deadline_exceeded(spark, csv_dir, tmp_path):
    """dagrun_timeout analogue: a clock that jumps past the deadline
    after sensing makes the run fail at the next stage boundary."""
    from open_source_etl_spark.ingest.pipeline import (
        IngestionDeadlineExceeded,
        RetryPolicy,
    )

    store = MetadataStore(spark, str(tmp_path / "meta"))
    store.upsert("bundesliga_match_scores", key_type="transactional")
    t = {"now": 0.0}
    def jumping_clock():
        t["now"] += 2000.0  # every stage-boundary look advances 2000 s
        return t["now"]
    with pytest.raises(IngestionDeadlineExceeded):
        run_ingestion(
            spark,
            entity="bundesliga_match_scores",
            source_glob=csv_dir + "/*.csv",
            landing_root=str(tmp_path / "landing"),
            metadata=store,
            run_date=dt.date(2021, 3, 7),
            policy=RetryPolicy(run_deadline=3600.0),
            clock=jumping_clock,
            sleep=lambda s: None,
        )
