"""Key-value pipeline metadata store.

Reference: ``pipeline_metadata.t_key_value_pairs(m_key, m_key_type,
m_value)`` in Snowflake (`settings.txt:20-21`), point-read at
`dags/…:36-45`/`:105-114` and point-updated via
``UPDATE … SET m_value = m_key_type||'/'||entity||'/'||suffix WHERE
m_key = entity`` (`dags/…:82-102`).

Engine realization: a tiny parquet-backed table with read-modify-overwrite
upserts.  This is deliberately the ONLY driver-materialized state in the
engine (SURVEY.md §7 "100 TB posture") — it is O(entities), never O(data).
Writes go through a temp directory + atomic rename so a crashed writer
can't leave a half-written store; concurrent writers would need a real
transactional table format (Delta/Iceberg — jars not in this image).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("m_key", StringType(), False),
        StructField("m_key_type", StringType(), True),
        StructField("m_value", StringType(), True),
    ]
)


class MetadataStore:
    """Point lookups and upserts over the key-value metadata table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or (
            os.path.isdir(self.path) and any(f.endswith(".parquet") for f in os.listdir(self.path))
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], SCHEMA)
        return self.spark.read.schema(SCHEMA).parquet(self.path)

    def get_key_type(self, key: str) -> str | None:
        """Reference task #1 (`dags/…:35-52`): first row's m_key_type."""
        row = self.read().filter(F.col("m_key") == key).select("m_key_type").first()
        return row[0] if row else None

    def get_value(self, key: str) -> str | None:
        """Reference task #5 (`dags/…:104-120`)."""
        row = self.read().filter(F.col("m_key") == key).select("m_value").first()
        return row[0] if row else None

    def upsert(self, key: str, key_type: str | None = None, value: str | None = None) -> None:
        """Insert-or-update one key (reference task #4, `dags/…:80-102`,
        which concats `m_key_type || '/' || entity || '/' || suffix`; the
        caller passes the already-built value here).

        Read-modify-overwrite through a temp dir + atomic swap: the store
        is tiny (one row per entity), so rewriting it wholesale is the
        right cost model; atomicity comes from `os.replace`-style rename.
        """
        current = self.read().collect()
        by_key = {r["m_key"]: {"m_key_type": r["m_key_type"], "m_value": r["m_value"]} for r in current}
        entry = by_key.setdefault(key, {"m_key_type": None, "m_value": None})
        if key_type is not None:
            entry["m_key_type"] = key_type
        if value is not None:
            entry["m_value"] = value
        rows = [
            Row(m_key=k, m_key_type=v["m_key_type"], m_value=v["m_value"])
            for k, v in sorted(by_key.items())
        ]
        tmp = tempfile.mkdtemp(prefix="osetl_meta_", dir=os.path.dirname(self.path) or ".")
        try:
            self.spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(tmp, "data")
            )
            if os.path.isdir(self.path):
                shutil.rmtree(self.path)
            os.replace(os.path.join(tmp, "data"), self.path)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def set_partition_value(self, key: str, suffix: str) -> str:
        """The reference's exact value shape: `<key_type>/<entity>/<suffix>`
        (`dags/…:82-84` string concat)."""
        key_type = self.get_key_type(key)
        if key_type is None:
            raise KeyError(f"no m_key_type registered for {key!r}")
        value = f"{key_type}/{key}/{suffix}"
        self.upsert(key, value=value)
        return value
