"""Structured Streaming layer (SURVEY.md §2B streaming).

The reference's only "stream" is an S3 sensor polling for new files
(`dags/ingest_bundesliga_match_scores.py:54-67`, 30 s poke, reschedule
mode).  The engine generalizes that to Spark Structured Streaming: a file
source discovers new data natively, watermarks bound state for late data,
and windowed/sessionized/stateful aggregations run incrementally.

Determinism protocol for tests and the t2 oracle gate: every streaming
query runs with ``Trigger.AvailableNow`` into a memory sink and must equal
the equivalent batch computation (batch-parity — SURVEY.md §7 step 7).
"""

from .ops import (
    dedup_keys,
    dedup_keys_within_watermark,
    session_window_stats,
    sliding_window_counts,
    HAS_TWS_PROTO,
    ROCKSDB_PROVIDER,
    stateful_histogram,
    stateful_user_rollup,
    transform_with_state_histogram,
    stream_stream_interval_join,
    tumbling_window_counts,
)
from .runner import run_available_now
from .source import stream_events

__all__ = [
    "stream_events",
    "run_available_now",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_stats",
    "dedup_keys",
    "dedup_keys_within_watermark",
    "HAS_TWS_PROTO",
    "ROCKSDB_PROVIDER",
    "stateful_histogram",
    "stateful_user_rollup",
    "transform_with_state_histogram",
    "stream_stream_interval_join",
]
