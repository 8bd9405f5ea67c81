"""The reference ingestion DAG as a *continuous* pipeline.

The reference polls S3 with a sensor, copies files, and re-registers an
external table per run (`dags/ingest_bundesliga_match_scores.py:54-67,
130-143`).  The streaming restatement collapses sense+list+copy into one
declaration: the file source discovers new CSVs (the sensor), the
partitioned parquet sink lands them date-partitioned (the copy+layout),
and the checkpoint remembers what was processed (the metadata table's
bookkeeping role).  ``Trigger.AvailableNow`` gives the batch-like "drain
what's there and stop" mode; a real deployment runs the same code with a
processing-time trigger.

Scale: file discovery is incremental (listing cost bounded by NEW files,
vs the reference re-listing the prefix every 30 s); the write is
executor-parallel and partition-pruned for every downstream reader.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..ingest.partitioner import partition_columns


def stream_csv_to_partitioned_parquet(
    spark: SparkSession,
    source_dir: str,
    landing_path: str,
    schema: StructType,
    date_column: str = "date",
    timeout_sec: int = 300,
) -> DataFrame:
    """Continuously land CSVs date-partitioned; returns the landed data.

    The schema is explicit (streaming sources require one — the catalog
    tier of the reference's two-tier resolution, SURVEY.md §1.3); the
    date partition columns derive from file *content*, not arrival time,
    so replays land identically.
    """
    src = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .csv(source_dir)
    )
    parted = src.select("*", *partition_columns(F.to_date(F.col(date_column))))
    checkpoint = tempfile.mkdtemp(prefix="osetl-ingest-ckpt-")
    q = (
        parted.writeStream.format("parquet")
        .option("path", landing_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("year", "month", "day")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - only on timeout
        q.stop()
    return spark.read.parquet(landing_path)
