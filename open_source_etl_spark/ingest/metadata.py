"""Key-value pipeline metadata store.

Reference: ``pipeline_metadata.t_key_value_pairs(m_key, m_key_type,
m_value)`` in Snowflake (`settings.txt:20-21`), point-read at
`dags/…:36-45`/`:105-114` and point-updated via
``UPDATE … SET m_value = m_key_type||'/'||entity||'/'||suffix WHERE
m_key = entity`` (`dags/…:82-102`).

Engine realization: a tiny parquet-backed table with read-modify-overwrite
upserts.  This is deliberately the ONLY driver-materialized state in the
engine (SURVEY.md §7 "100 TB posture") — it is O(entities), never O(data),
so the IO runs driver-side through pyarrow: every Spark job on a 3-row
table is pure scheduler latency (round 1 spent ~8 jobs here per pipeline
run).  The file stays ordinary parquet, so ``spark.read.parquet`` and the
oracle can read the same store.  Writes go through a temp directory +
atomic rename so a crashed writer can't leave a half-written store;
concurrent writers would need a real transactional table format
(Delta/Iceberg — jars not in this image).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
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

    _ARROW_SCHEMA = pa.schema(
        [
            pa.field("m_key", pa.string(), nullable=False),
            pa.field("m_key_type", pa.string()),
            pa.field("m_value", pa.string()),
        ]
    )

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def _read_rows(self) -> dict[str, dict[str, str | None]]:
        """Driver-side point read — no Spark job for an O(entities) table."""
        if not self._exists():
            return {}
        table = pq.read_table(self.path)
        return {
            k: {"m_key_type": t, "m_value": v}
            for k, t, v in zip(
                table.column("m_key").to_pylist(),
                table.column("m_key_type").to_pylist(),
                table.column("m_value").to_pylist(),
            )
        }

    def read(self) -> DataFrame:
        """The store as a Spark DataFrame (it is plain parquet on disk)."""
        if not self._exists():
            return self.spark.createDataFrame([], SCHEMA)
        return self.spark.read.schema(SCHEMA).parquet(self.path)

    def get_key_type(self, key: str) -> str | None:
        """Reference task #1 (`dags/…:35-52`): first row's m_key_type."""
        entry = self._read_rows().get(key)
        return entry["m_key_type"] if entry else None

    def get_value(self, key: str) -> str | None:
        """Reference task #5 (`dags/…:104-120`)."""
        entry = self._read_rows().get(key)
        return entry["m_value"] if entry else None

    def upsert(self, key: str, key_type: str | None = None, value: str | None = None) -> None:
        """Insert-or-update one key (reference task #4, `dags/…:80-102`,
        which concats `m_key_type || '/' || entity || '/' || suffix`; the
        caller passes the already-built value here).

        Read-modify-overwrite through a temp dir + atomic swap: the store
        is tiny (one row per entity), so rewriting it wholesale is the
        right cost model; atomicity comes from `os.replace`-style rename.
        """
        by_key = self._read_rows()
        entry = by_key.setdefault(key, {"m_key_type": None, "m_value": None})
        if key_type is not None:
            entry["m_key_type"] = key_type
        if value is not None:
            entry["m_value"] = value
        keys = sorted(by_key)
        table = pa.table(
            {
                "m_key": keys,
                "m_key_type": [by_key[k]["m_key_type"] for k in keys],
                "m_value": [by_key[k]["m_value"] for k in keys],
            },
            schema=self._ARROW_SCHEMA,
        )
        tmp = tempfile.mkdtemp(prefix="osetl_meta_", dir=os.path.dirname(self.path) or ".")
        try:
            data_dir = os.path.join(tmp, "data")
            os.makedirs(data_dir)
            pq.write_table(table, os.path.join(data_dir, "part-00000.parquet"))
            if os.path.isdir(self.path):
                shutil.rmtree(self.path)
            os.replace(data_dir, self.path)
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
