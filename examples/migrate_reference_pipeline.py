"""The reference user's day-1 workflow, end-to-end on this engine.

A user of sumaniitm/open-source-etl runs, per entity: an S3 sensor +
metadata lookup, partitioned landing, all-varchar external staging
(`dags/ingest_bundesliga_match_scores.py:24-210`), a Great Expectations
validation (`include/scripts/data_services/data_validator.py:14-39`),
and a dbt model build (`data_transformations/`).  This script is that
exact workflow on the PySpark engine — run it to see every stage land:

    python examples/migrate_reference_pipeline.py [workdir]

Stages:
  1. register the entity in the key-value metadata store
  2. drop a reference-shaped CSV feed (header + unnamed index column)
  3. run the ingestion DAG (sense -> partition -> land -> stage)
  4. validate the staged view (reference expectation suite) AND collect
     observe() metrics on the silver write — zero extra passes
  5. build the model DAG (staging -> silver typed view -> gold table)
     in ref() dependency order, with schema tests
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_etl_spark.conf import EngineConfig
from open_source_etl_spark.dq import (
    null_count,
    row_count,
    validate,
    validate_while_writing,
)
from open_source_etl_spark.dq.expectations import bundesliga_suite
from open_source_etl_spark.ingest.metadata import MetadataStore
from open_source_etl_spark.ingest.pipeline import run_ingestion
from open_source_etl_spark.models.registry import ModelRegistry
from open_source_etl_spark.session import build_session

FEED = (
    ",round,day,date,home,score,away,attendance,venue\n"
    "0,Regular Season,Sat,2021-03-06,FCB,3-1,BVB,25000,Allianz\n"
    "1,Regular Season,Sun,2021-03-07,S04,0-2,RBL,18000,Veltins\n"
    "2,Regular Season,Sun,2021-03-07,BVB,2-2,FCB,30000,Signal Iduna\n"
)


def main(workdir: str) -> None:
    os.makedirs(workdir, exist_ok=True)
    spark = build_session(EngineConfig(master="local[4]", shuffle_partitions=4))
    spark.sparkContext.setLogLevel("ERROR")

    # 1. metadata registration (reference settings.txt + t_key_value_pairs)
    store = MetadataStore(spark, f"{workdir}/meta")
    store.upsert("bundesliga_match_scores", key_type="transactional")

    # 2. the inbound feed
    raw = f"{workdir}/inbound"
    os.makedirs(raw, exist_ok=True)
    with open(f"{raw}/bundesliga_match_scores_2021.csv", "w") as f:
        f.write(FEED)

    # 3. the ingestion DAG
    result = run_ingestion(
        spark,
        entity="bundesliga_match_scores",
        source_glob=raw + "/*.csv",
        landing_root=f"{workdir}/landing",
        metadata=store,
        run_date=dt.date(2021, 3, 7),
    )
    assert result is not None, "sensor soft-fail: no files found"
    print(f"landed  : {result.staged_rows} rows -> {result.landing_path}")
    print(f"metadata: partition_value = {result.partition_value}")
    staged = spark.table(result.staging_view)

    # 4a. declarative validation (the reference's GE suite; the schema
    # check is skipped because this feed carries the 9-column subset)
    suite = [e for e in bundesliga_suite() if e.kind != "schema"]
    vr = validate(staged, suite, report_path=f"{workdir}/validation.json")
    print(f"validate: success={vr.success} ({len(vr.results)} expectations)")

    # 4b. observe() metrics piggybacked on the silver write
    silver = staged.select(
        F.col("data_id").cast("bigint").alias("data_id"),
        "round",
        "day",
        F.to_date("date").alias("match_date"),
        "home",
        "away",
        "score",
        F.col("attendance").cast("bigint").alias("attendance"),
        "venue",
    )
    metrics = validate_while_writing(
        silver, f"{workdir}/silver", row_count(), null_count("data_id")
    )
    print(f"observe : {metrics}")

    # 5. the model DAG (dbt analogue): silver view -> gold table
    reg = ModelRegistry()
    reg.register(
        "match_scores_silver",
        lambda spark, ref: spark.read.parquet(f"{workdir}/silver"),
        materialized="view",
        tests={"unique": ("data_id",), "not_null": ("data_id", "match_date")},
    )

    def gold(spark: SparkSession, ref) -> DataFrame:
        s = ref("match_scores_silver")
        return (
            s.groupBy("venue")
            .agg(
                F.count("*").alias("n_matches"),
                F.sum("attendance").alias("total_attendance"),
            )
            .orderBy("venue")
        )

    reg.register(
        "venue_attendance_gold",
        gold,
        materialized="table",
        depends_on=("match_scores_silver",),
        tests={"not_null": ("venue",)},
    )
    built = reg.build(spark)
    test_results = reg.test(spark)
    print(f"models  : built {list(built)} in ref() order; tests: {test_results}")
    assert all(test_results.values()), test_results
    built["venue_attendance_gold"].show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="osetl-example-"))
