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


@dataclass(frozen=True)
class RetryPolicy:
    """The reference DAG's resilience knobs, restated
    (``dags/ingest_bundesliga_match_scores.py:29,55-66``): the S3 sensor
    polls every ``poke_interval=30`` s until ``timeout=180`` s with
    ``retries=2`` and ``soft_fail=True``; the whole run is bounded by
    ``dagrun_timeout=60`` minutes."""

    sensor_timeout: float = 180.0
    sensor_poke_interval: float = 30.0
    sensor_retries: int = 2
    run_deadline: float = 3600.0


class IngestionDeadlineExceeded(TimeoutError):
    """Run exceeded RetryPolicy.run_deadline (reference dagrun_timeout)."""


class _Deadline:
    """Cooperative run deadline, checked between pipeline stages — the
    same semantics as Airflow's ``dagrun_timeout``, which marks the run
    failed at task boundaries rather than preempting a running task."""

    def __init__(self, seconds: float, clock) -> None:
        self._clock = clock
        self._expires = clock() + seconds

    def check(self, stage: str) -> None:
        if self._clock() > self._expires:
            raise IngestionDeadlineExceeded(
                f"run deadline exceeded before stage {stage!r}"
            )


def sense_files_with_retry(
    pattern: str,
    spark: SparkSession | None = None,
    policy: RetryPolicy = RetryPolicy(),
    clock=None,
    sleep=None,
) -> list[str]:
    """Sensor semantics of the reference S3KeySensor (`dags/…:55-66`):
    poll ``pattern`` every ``poke_interval`` until ``sensor_timeout``;
    an exhausted timeout soft-fails to ``[]`` (callers skip, no raise).
    ERRORS while sensing (flaky store, transient auth) consume one of
    ``sensor_retries`` fresh attempts, then re-raise — exactly the
    retries-vs-soft_fail split Airflow makes.  ``clock``/``sleep`` are
    injectable so tests drive time instead of waiting it out."""
    import time as _time

    clock = clock or _time.monotonic
    sleep = sleep or _time.sleep
    attempts_left = policy.sensor_retries
    while True:
        deadline = clock() + policy.sensor_timeout
        try:
            while True:
                files = sense_files(pattern, spark)
                if files:
                    return files
                if clock() >= deadline:
                    return []  # soft_fail: timeout is a skip, not an error
                sleep(policy.sensor_poke_interval)
        except Exception:
            if attempts_left <= 0:
                raise
            attempts_left -= 1


def sense_files(pattern: str, spark: SparkSession | None = None) -> list[str]:
    """Source-availability check (reference S3KeySensor, `dags/…:54-67`).

    Batch analogue: a glob over the landing prefix. Returns matches (the
    reference soft-fails on timeout; callers treat [] the same way). The
    streaming analogue is the file source itself (streaming/pipelines.py).

    Scheme-agnostic when a session is supplied: the glob resolves through
    the Hadoop FileSystem owning the pattern's scheme (``s3a://…`` lists
    the object store exactly like the reference sensor; see ``fs.py``).
    A URI-schemed pattern REQUIRES the session — silently globbing the
    local OS for an s3a pattern would report "no files" instead of the
    truth.  Schemeless patterns without a session keep the local glob.
    """
    if spark is not None:
        from ..fs import hadoop_glob

        return hadoop_glob(spark, pattern)
    if "://" in pattern:
        raise ValueError(
            f"pattern {pattern!r} has a URI scheme; pass the SparkSession "
            "so the glob can resolve through its Hadoop filesystem"
        )
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
    policy: RetryPolicy | None = None,
    clock=None,
    sleep=None,
) -> IngestionResult | None:
    """The full DAG, stages 1-10, as sequential DataFrame ops.

    With ``policy`` set, the sensor stage polls/retries per the reference
    knobs and the whole run honors a cooperative ``run_deadline``
    (checked at stage boundaries — Airflow's ``dagrun_timeout``
    semantics); without it, sensing is a single immediate look."""
    import time as _time

    deadline = _Deadline(
        policy.run_deadline if policy else float("inf"), clock or _time.monotonic
    )
    # 1. metadata point lookup (key type = dataset kind)
    key_type = metadata.get_key_type(entity)
    if key_type is None:
        raise KeyError(f"entity {entity!r} not registered in metadata")

    # 2. sense files (soft-fail → None, like the sensor's soft_fail=True)
    deadline.check("sense_files")
    if policy is not None:
        files = sense_files_with_retry(
            source_glob, spark, policy, clock=clock, sleep=sleep
        )
    else:
        files = sense_files(source_glob, spark)
    if not files:
        return None

    # 3-5. partition suffix + metadata update + read-back
    deadline.check("metadata_update")
    suffix = partition_suffix(run_date)
    partition_value = metadata.set_partition_value(entity, suffix)
    landing_path = f"{landing_root}/{entity}"

    # 6-7. land the files date-partitioned (list+copy+layout in one pass)
    deadline.check("stage_csv")
    staged = stage_csv(
        spark,
        source_glob,
        landing_path,
        date_column=date_column,
        run_date=None if partition_by_content else run_date,
    )

    # 8-10. schema resolution + all-varchar staging view over the raw CSVs
    deadline.check("schema_resolution")
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
