"""Source/sink surface (SURVEY.md §2B scans/sources/sinks).

Parquet scans live in ``catalog.load_table``; CSV staging in
``ingest.staging``; the streaming file source in ``streaming.source``.
This package holds the remaining formats: line-delimited JSON and the
partitioned/managed sinks, with the same schema-two-tier design as the
reference (explicit catalog schema when present, inference fallback).
"""

from .bucketing import bucketed_join, write_bucketed
from .merge import merge_into
from .pysource import SyntheticEventsSource
from .readers import (
    compact_parquet,
    overwrite_partitions,
    read_binary_files,
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
    write_partitioned,
)

__all__ = [
    "SyntheticEventsSource",
    "merge_into",
    "read_binary_files",
    "read_jsonl",
    "read_orc",
    "write_jsonl",
    "write_orc",
    "write_partitioned",
    "overwrite_partitions",
    "compact_parquet",
    "write_bucketed",
    "bucketed_join",
]
