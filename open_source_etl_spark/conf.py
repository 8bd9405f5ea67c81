"""Engine configuration.

The reference reads a typed settings file + env vars at import time
(``include/scripts/utils/config.py:10-77``: pydantic BaseSettings over env,
then an INI-ish ``settings.txt``).  The engine keeps the same two-tier idea —
env overrides file — but as a plain dataclass with explicit precedence and no
import-time side effects (the reference creates Airflow connections on import,
``config.py:128-129``; we deliberately don't).
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    """Runtime settings for the engine.

    Mirrors the semantics of the reference's settings surface
    (``include/scripts/settings.txt:1-30``): source format/delimiter, the
    partition scheme, entity registry, and metadata table names — plus
    Spark-specific tuning that replaces the reference's warehouse knobs.
    """

    # Source layer (reference settings.txt:1-3,26-30)
    source_format: str = "csv"
    source_delimiter: str = ","
    raw_prefix: str = "inbound/incremental/raw"

    # Partition scheme (reference settings.txt:6-10, partitioner.py:7-25)
    partition_levels: tuple[str, ...] = ("year", "month", "day")

    # Entity registry (reference settings.txt:4-5)
    entities: tuple[str, ...] = (
        "bundesliga_match_scores",
        "frenchligue1_match_scores",
        "laliga_match_scores",
        "premierleague_match_scores",
        "seriea_match_scores",
    )

    # Metadata tables (reference settings.txt:20-21)
    metadata_table: str = "t_key_value_pairs"
    colmap_table: str = "t_column_map"

    # Spark tuning
    master: str = "local[*]"
    app_name: str = "open-source-etl-spark"
    shuffle_partitions: int = 32
    session_timezone: str = "UTC"
    max_partition_bytes: str = "128m"
    adaptive_enabled: bool = True
    warehouse_dir: str = "/tmp/osetl_spark_warehouse"

    # Object-store / filesystem pass-through (reference stage is S3-native,
    # settings.txt:12-16): entries land on the session's Hadoop
    # configuration, so any scheme Hadoop knows (s3a://, hdfs://,
    # viewfs://) works everywhere the engine takes a path.  Typical keys:
    # fs.s3a.endpoint, fs.s3a.aws.credentials.provider, fs.s3a.path.style
    # .access, fs.viewfs.mounttable.*.link./*.  Sourced from the INI's
    # [hadoop] section; build_session applies them as spark.hadoop.*, and
    # fs.apply_hadoop_conf installs them on an already-running session.
    hadoop_conf: dict[str, str] = field(default_factory=dict)

    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, ini_path: str | None = None) -> "EngineConfig":
        """Build config: defaults < INI file < OSETL_* environment vars.

        Same resolution order as the reference (file then env,
        ``config.py:10-24`` env BaseSettings layered over ``:27-77`` INI
        parsing), made explicit.
        """
        values: dict[str, object] = {}
        hadoop: dict[str, str] = {}
        if ini_path and os.path.exists(ini_path):
            parser = configparser.ConfigParser()
            # Hadoop keys are dot-delimited and case-sensitive
            # (fs.s3a.pathStyleAccess); disable configparser's lowercasing
            parser.optionxform = str  # type: ignore[assignment]
            parser.read(ini_path)
            if parser.has_section("engine"):
                for key, val in parser.items("engine"):
                    values[key.lower()] = val
            if parser.has_section("hadoop"):
                hadoop.update(parser.items("hadoop"))
        if hadoop:
            values["hadoop_conf"] = hadoop
        for f in fields(cls):
            env_key = f"OSETL_{f.name.upper()}"
            if env_key in os.environ:
                values[f.name] = os.environ[env_key]
        known = {f.name for f in fields(cls)}
        typed: dict[str, object] = {}
        for key, val in values.items():
            if key not in known:
                continue
            if key in ("shuffle_partitions",):
                typed[key] = int(val)  # type: ignore[arg-type]
            elif key in ("adaptive_enabled",):
                typed[key] = str(val).lower() in ("1", "true", "yes")
            elif key in ("partition_levels", "entities"):
                typed[key] = tuple(str(val).split(","))
            else:
                typed[key] = val
        return cls(**typed)  # type: ignore[arg-type]


DEFAULT_CONFIG = EngineConfig()
