"""Line-delimited JSON source and partitioned sinks.

Reference provenance: the engine generalizes the reference's
CSV-external-table pattern (`dags/ingest_bundesliga_match_scores.py:
174-196`) to every file format the fixtures imply — event ``props`` are
JSON strings, so the JSON *file* source is part of the surface
(SURVEY.md §2B "JSON scan").

Scale notes: ``spark.read.json`` with an explicit schema is a single
distributed pass (no inference scan); leaving ``schema=None`` costs one
extra sampling pass — the same trade the reference makes with its 1-row
header sniff (`dags/…:168-169`).  Writers land Hive-style partition
directories so downstream scans partition-prune for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read line-delimited JSON.  With ``schema`` (catalog-supplied tier):
    one pass, no inference; without: Spark samples to infer (the fallback
    tier)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write line-delimited JSON (the interchange sink — validation
    reports, small exports; columnar parquet remains the data sink)."""
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read ORC (Spark-native columnar alternative to parquet; same
    predicate-pushdown and column-pruning behavior at scale)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ORC (interchange with Hive/Trino-centric warehouses)."""
    df.write.mode(mode).orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read raw files as rows — (path, modificationTime, length, content)
    with ``content`` the whole file as a binary column.  The ingestion
    entry for multimodal corpora (images/audio/video land as opaque bytes
    plus provenance; decode happens later in multimodal/decode.py).  The
    listing is distributed, so a 10⁸-object bucket doesn't serialize
    through the driver."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink (Hive layout).  The engine analogue of the
    reference's dated landing copy (`dags/…:130-143`): layout + columnar
    conversion in one distributed pass, partition-prunable thereafter."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent partition-level upsert: rewrite ONLY the partitions
    present in ``df``, leaving the rest of the dataset untouched.

    This is the reference's daily re-run semantics (the DAG re-lands one
    date partition per run, `dags/…:80-143`) done safely: static
    overwrite mode would truncate the WHOLE table; dynamic mode scopes
    the overwrite to the incoming partition values.  The engine analogue
    of MERGE-by-partition without requiring a table format with a commit
    log (Delta/Iceberg would take over this role in production).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(
    spark: "SparkSession",
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files near
    ``target_file_bytes``.  Returns the output file count.

    Streaming/incremental sinks accrete many small files; at 100 TB each
    scan then pays per-file open/footer costs and the driver pays listing
    costs.  Compaction sizes output files from the dataset's actual bytes
    (not row counts), writes to a temp sibling, and atomically swaps via
    rename — readers see either the old or the new layout.
    """
    import math
    import os as _os
    import shutil

    total_bytes = sum(
        _os.path.getsize(_os.path.join(root, f))
        for root, _, files in _os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    _os.rename(path, old)
    _os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def read_jsonl_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE line-delimited-JSON read split into (good, quarantined)
    — the JSON twin of ``ingest.staging.read_csv_with_quarantine``, same
    contract: every input line lands exactly once, either as a fully
    typed row in `good` or as its raw text in `bad` for replay after a
    schema fix.  Semi-structured feeds corrupt MORE often than CSV
    (truncated objects, mixed encodings, concatenated docs), so the
    quarantine path is the production default for event streams."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    full_schema = StructType(schema.fields + [StructField(corrupt_col, StringType())])
    raw = (
        spark.read.options(
            mode="PERMISSIVE", columnNameOfCorruptRecord=corrupt_col
        )
        .schema(full_schema)
        .json(path)
        .cache()
    )
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = raw.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def analyze_table_stats(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> dict:
    """Collect catalog statistics (ANALYZE TABLE ... COMPUTE STATISTICS)
    so Spark's cost-based optimizer has real row counts / sizes / NDVs
    to reorder joins and pick broadcast sides with.

    At 100 TB, CBO decisions made from file sizes alone misjudge joins
    whose selective filters cut 1000x; column-level stats (min/max/NDV/
    null count) feed both join reordering and star-schema detection.
    Returns the collected table-level stats for assertion/monitoring.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    stats = {}
    for r in desc:
        if r.col_name == "Statistics":
            stats["statistics"] = r.data_type
    return stats
