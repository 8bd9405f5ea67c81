"""Streaming file source over the events fixture.

Engine restatement of the reference's S3KeySensor
(`dags/ingest_bundesliga_match_scores.py:54-67`): instead of a poll loop
that *senses* files and a separate copy task that *moves* them, Spark's
file source discovers new files, tracks processed ones in the checkpoint,
and feeds them incrementally to the query.  At 100 TB this is the
scale path — no driver-side listing loop, no per-file Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with the batch-derived schema.

    Streaming sources need an explicit schema; deriving it from a batch
    read of the same path keeps the two in lockstep (footer-only read —
    no data IO).  ``ts`` is normalized to TIMESTAMP whatever the fixture's
    physical type (nanosecond longs or TIMESTAMP_NTZ; see
    ``catalog.load_table``) — watermarks reject NTZ event-time columns.
    """
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = (
        spark.readStream.schema(batch.schema)
        # the file source wants a directory to watch (the reference's
        # sensed S3 prefix); glob-filter to the events file within it.
        # At scale maxFilesPerTrigger bounds per-batch work and
        # AvailableNow drains the backlog in chunks.
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
