"""Checkpoint recovery: the exactly-once resume guarantee.

A streaming job's checkpoint (source offsets + sink commit log) is the
ledger that makes restarts exactly-once: a second run over the SAME
checkpoint must process only files that arrived after the first run, and
re-running with nothing new must emit nothing.  This is the guarantee
the incremental-ingestion design leans on (SCALE.md §5); the
oracle-parity streaming queries never restart, so it was untested.
The sink is parquet — the file sink participates in recovery via its
commit log (the memory sink is test-only and refuses to resume).
"""

from __future__ import annotations


def _write_chunk(spark, path: str, ids: list[int]) -> None:
    spark.createDataFrame([(i,) for i in ids], "event_id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _drain_to_parquet(spark, src: str, ckpt: str, out: str) -> None:
    stream = (
        spark.readStream.schema("event_id long")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"


def _sink_ids(spark, out: str) -> list[int]:
    return [r.event_id for r in spark.read.parquet(out).collect()]


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _write_chunk(spark, f"{src}/c0", [1, 2, 3])
    _drain_to_parquet(spark, src, ckpt, out)
    assert sorted(_sink_ids(spark, out)) == [1, 2, 3]

    # restart over the same checkpoint with one new file: only the new
    # rows are appended — any reprocessing of c0 would duplicate ids
    _write_chunk(spark, f"{src}/c1", [4, 5])
    _drain_to_parquet(spark, src, ckpt, out)
    assert sorted(_sink_ids(spark, out)) == [1, 2, 3, 4, 5]

    # a third restart with no new input appends nothing
    _drain_to_parquet(spark, src, ckpt, out)
    assert sorted(_sink_ids(spark, out)) == [1, 2, 3, 4, 5]


def test_fresh_checkpoint_reprocesses_everything(spark, tmp_path):
    """Contrast case: a NEW checkpoint replays the full backlog — the
    checkpoint, not the data layout, is what carries progress."""
    src = str(tmp_path / "src")
    _write_chunk(spark, f"{src}/c0", [1, 2, 3])
    _write_chunk(spark, f"{src}/c1", [4, 5])

    out_a = str(tmp_path / "out_a")
    _drain_to_parquet(spark, src, str(tmp_path / "ckpt_a"), out_a)
    out_b = str(tmp_path / "out_b")
    _drain_to_parquet(spark, src, str(tmp_path / "ckpt_b"), out_b)
    assert sorted(_sink_ids(spark, out_a)) == sorted(_sink_ids(spark, out_b)) == [1, 2, 3, 4, 5]
