"""Run a streaming DataFrame to a deterministic, inspectable result.

``Trigger.AvailableNow`` processes exactly the data present at start and
stops — the streaming analogue of a batch run, and the engine's
batch-parity harness (SURVEY.md §7 step 7).  The memory sink holds the
result for comparison; production sinks are parquet/Delta with the same
checkpoint protocol.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def run_available_now(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming query to completion; return the sink table.

    Each run gets a fresh checkpoint dir: the checkpoint IS the exactly-
    once ledger (source offsets + state store), so reusing one across
    logically different queries corrupts semantics.  Long-lived production
    streams keep theirs forever; these deterministic replays never should.
    """
    spark: SparkSession = df.sparkSession
    checkpoint = tempfile.mkdtemp(prefix=f"osetl-stream-{name}-")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:  # pragma: no cover - only on timeout
            q.stop()
    return spark.table(name)
