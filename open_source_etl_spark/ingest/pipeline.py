"""End-to-end ingestion pipeline: the reference DAG as one driver program.

Reference task chain (`dags/ingest_bundesliga_match_scores.py:208-210`):
get_key_type → file_sniffer → generate_s3_partition → update metadata →
read metadata → list files → copy files → generate DDL → create table.

Here the XCom dataflow is plain Python locals and DataFrames (SURVEY.md
§3.1 "Spark restatement"); Snowflake round-trips become catalog calls.
"""

from __future__ import annotations

import datetime as dt
import glob as _glob
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .metadata import MetadataStore
from .partitioner import partition_suffix
from .staging import resolve_columns, register_staging_view, stage_csv


@dataclass
class IngestionResult:
    entity: str
    partition_value: str
    staged_rows: int
    staging_view: str
    landing_path: str


def sense_files(pattern: str) -> list[str]:
    """Source-availability check (reference S3KeySensor, `dags/…:54-67`).

    Batch analogue: a glob over the landing prefix. Returns matches (the
    reference soft-fails on timeout; callers treat [] the same way). The
    streaming analogue is the file source itself (streaming/pipelines.py).
    """
    return sorted(_glob.glob(pattern))


def run_ingestion(
    spark: SparkSession,
    entity: str,
    source_glob: str,
    landing_root: str,
    metadata: MetadataStore,
    run_date: dt.date,
    date_column: str = "date",
    partition_by_content: bool = False,
    colmap: DataFrame | None = None,
) -> IngestionResult | None:
    """The full DAG, stages 1-10, as sequential DataFrame ops."""
    # 1. metadata point lookup (key type = dataset kind)
    key_type = metadata.get_key_type(entity)
    if key_type is None:
        raise KeyError(f"entity {entity!r} not registered in metadata")

    # 2. sense files (soft-fail → None, like the sensor's soft_fail=True)
    files = sense_files(source_glob)
    if not files:
        return None

    # 3-5. partition suffix + metadata update + read-back
    suffix = partition_suffix(run_date)
    partition_value = metadata.set_partition_value(entity, suffix)
    landing_path = f"{landing_root}/{entity}"

    # 6-7. land the files date-partitioned (list+copy+layout in one pass)
    staged = stage_csv(
        spark,
        source_glob,
        landing_path,
        date_column=date_column,
        run_date=None if partition_by_content else run_date,
    )

    # 8-10. schema resolution + all-varchar staging view over the raw CSVs
    columns = resolve_columns(
        spark, source_glob, f"t_{entity}_external", colmap=colmap, file_prefix=entity
    )
    register_staging_view(spark, source_glob, entity, columns)

    return IngestionResult(
        entity=entity,
        partition_value=partition_value,
        staged_rows=staged.count(),
        staging_view=f"t_{entity}_external",
        landing_path=landing_path,
    )
