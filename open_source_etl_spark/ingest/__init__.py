"""Ingestion layer: the reference pipeline's job, Spark-native.

Reference flow (`dags/ingest_bundesliga_match_scores.py:208-210`):
metadata lookup → sense files → compute date partition → update metadata →
copy files into the partition → resolve schema → register external table.

Engine flow (one driver program, `pipeline.run_ingestion`):
catalog lookup → glob check → read CSV → date-partitioned parquet write →
metadata upsert → all-string staging view registration.
"""

from .metadata import MetadataStore
from .partitioner import partition_columns, partition_suffix
from .staging import infer_csv_schema, register_staging_view, stage_csv

__all__ = [
    "MetadataStore",
    "partition_columns",
    "partition_suffix",
    "infer_csv_schema",
    "register_staging_view",
    "stage_csv",
]
