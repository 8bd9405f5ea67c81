"""Multi-micro-batch watermark semantics: advancement, late-data drop,
state eviction.

The oracle-parity streaming queries replay the fixture as ONE micro-batch,
which proves operator output but never advances the watermark — eviction
and late-row dropping are untriggered.  This test replays a crafted
3-file event log with ``maxFilesPerTrigger=1`` so the watermark moves
between batches and the semantics the 100 TB posture depends on (bounded
state, late data dropped past the watermark) actually execute:

- batch 1: events in the [10:00, 11:00) window
- batch 2: events at 12:00+ → watermark advances to 11:30+ (30 min delay),
  closing the 10:00 window
- batch 3: one LATE event at 08:59 (window end 09:00 is behind even the
  batch-START watermark → must be dropped) and one on-time event

Late-row filtering uses the watermark as of the START of the batch (the
previous batch's closing value — one batch behind the value
StreamingQueryProgress reports), while end-of-batch eviction uses the
updated one; the late row sits behind both so the drop is unambiguous.

Append mode emits only finalized windows, so the sink must contain the
10:00 window exactly once, with a count that excludes the late row.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F


def _write_chunk(spark, path: str, rows: list[tuple[int, str]]) -> None:
    df = spark.createDataFrame(
        [(eid, ts) for eid, ts in rows], "event_id long, ts_s string"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_watermark_advances_and_drops_late_rows(spark, tmp_path):
    src = tmp_path / "evlog"
    src.mkdir()
    # distinct mtimes so the file source replays chunks in order
    chunks = [
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:20:00"), (3, "2024-01-01 10:40:00")],
        [(4, "2024-01-01 12:00:00"), (5, "2024-01-01 12:05:00")],
        # 6's window ends 09:00, behind the 10:10 batch-start watermark
        # -> dropped; 7 keeps the final batch on-time
        [(6, "2024-01-01 08:59:00"), (7, "2024-01-01 12:10:00")],
    ]
    for i, rows in enumerate(chunks):
        chunk_dir = str(src / f"chunk_{i}")
        _write_chunk(spark, chunk_dir, rows)
        now = time.time() + i  # strictly increasing per chunk
        for root, _dirs, files in os.walk(chunk_dir):
            for f in files:
                os.utime(os.path.join(root, f), (now, now))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckpt")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"
    progresses = q.recentProgress

    out = {r.window_start.strftime("%H:%M"): r.n for r in spark.table(name).collect()}

    # Only the 10:00 window is finalized (12:00's end is past the final
    # watermark), and the late event 6 must NOT be in its count.
    assert out == {"10:00": 3}

    # the state operator really did drop the late row by watermark
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progresses
        for op in (p["stateOperators"] if isinstance(p, dict) else p.stateOperators or [])
    )
    assert dropped >= 1

    # multiple micro-batches actually ran (one per file)
    batches = {p["batchId"] if isinstance(p, dict) else p.batchId for p in progresses}
    assert len(batches) >= 3
