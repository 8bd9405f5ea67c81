"""CSV staging: schema resolution, all-string external views, partitioned
landing writes.

Reference semantics:
- two-tier schema resolution (`dags/…:145-172`, SURVEY.md §1.3): try the
  column-map metadata table (`SELECT DISTINCT snowflake_table_column_name
  WHERE s3_file_name_wc LIKE '<prefix>%' AND snowflake_table_name = t`),
  fall back to a 1-row header sniff with `Unnamed: 0` → ``data_id``;
- staging table: every column varchar, positionally projected
  (`dags/…:174-188`), registered idempotently (`CREATE OR REPLACE`);
- landing: files moved under the date partition (`dags/…:130-143`).

Engine realization: the header sniff is ``spark.read.csv(header=True)``
(reads only headers — same minimal-IO property as the reference's
``chunksize=1``); the all-varchar external table is a CSV read with an
explicit all-StringType schema + temp view; the landing move is
``read → write.partitionBy(year,month,day)`` — copy + layout in one pass,
columnar at rest, partition-prunable thereafter.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .partitioner import MONTH_NAMES, partition_columns

# pandas calls the unnamed CSV index column 'Unnamed: 0' (the reference's
# rename target, `dags/…:170`); Spark's CSV reader calls it '_c0'
RAW_INDEX_COLUMNS = ("Unnamed: 0", "_c0")
INDEX_RENAME = "data_id"


def resolve_schema_from_colmap(
    colmap: DataFrame, file_prefix: str, table_name: str
) -> list[str] | None:
    """Metadata-driven column resolution (reference `dags/…:152-163`).

    In the reference this path is dead code — the config key is missing so
    it always raises (SURVEY.md §1.3); here it is actually reachable.
    Returns None when the map has no rows for the file/table pair.
    """
    cols = [
        r[0]
        for r in (
            colmap.filter(
                F.col("s3_file_name_wc").startswith(file_prefix)
                & (F.col("snowflake_table_name") == table_name)
            )
            .select("snowflake_table_column_name")
            .distinct()
            .collect()
        )
    ]
    return sorted(cols) if cols else None


def infer_csv_schema(spark: SparkSession, path: str, delimiter: str = ",") -> list[str]:
    """Header-sniff fallback (reference `dags/…:164-172`): read the header
    line only, rename the pandas-style unnamed index column to data_id."""
    header_df = spark.read.options(header=True, sep=delimiter).csv(path).limit(0)
    return [INDEX_RENAME if c in RAW_INDEX_COLUMNS else c for c in header_df.columns]


def resolve_columns(
    spark: SparkSession,
    path: str,
    table_name: str,
    colmap: DataFrame | None = None,
    file_prefix: str | None = None,
    delimiter: str = ",",
) -> list[str]:
    """Two-tier resolution: colmap if it answers, else header inference."""
    if colmap is not None and file_prefix is not None:
        cols = resolve_schema_from_colmap(colmap, file_prefix, table_name)
        if cols:
            return cols
    return infer_csv_schema(spark, path, delimiter)


def register_staging_view(
    spark: SparkSession,
    path: str,
    entity: str,
    columns: list[str],
    delimiter: str = ",",
) -> DataFrame:
    """All-varchar external table over raw CSVs (reference `dags/…:174-206`):
    explicit StringType schema (no inference pass over the data), positional
    projection, idempotent `t_<entity>_external` temp-view registration."""
    schema = StructType([StructField(c, StringType(), True) for c in columns])
    df = spark.read.options(header=True, sep=delimiter).schema(schema).csv(path)
    df.createOrReplaceTempView(f"t_{entity}_external")
    return df


def stage_csv(
    spark: SparkSession,
    source_path: str,
    landing_path: str,
    date_column: str,
    run_date: dt.date | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Landing move (reference tasks #3+#7, `dags/…:69-78,130-143`):
    read raw CSVs and write them date-partitioned.

    Two modes, matching the reference's two date sources:
    - ``run_date`` given → every file lands under that run's partition
      (the reference partitions by DAG run date, not row content);
    - ``run_date=None`` → partition by each row's ``date_column`` — the
      content-driven layout a 100 TB backfill needs (one pass, all
      partitions, executor-side IO only).
    """
    raw = spark.read.options(header=True, sep=delimiter, inferSchema=False).csv(source_path)
    for idx_col in RAW_INDEX_COLUMNS:
        if idx_col in raw.columns:
            raw = raw.withColumnRenamed(idx_col, INDEX_RENAME)
    if run_date is not None:
        dated = raw.withColumns(
            {
                "year": F.lit(run_date.year),
                "month": F.lit(MONTH_NAMES[run_date.month - 1]),
                "day": F.lit(run_date.day),
            }
        )
    else:
        year_c, month_c, day_c = partition_columns(F.col(date_column).cast("date"))
        dated = raw.withColumns({"year": year_c, "month": month_c, "day": day_c})
    dated.write.mode("overwrite").partitionBy("year", "month", "day").parquet(landing_path)
    # return the staged frame directly — a full parquet read-back of what
    # was just written costs a second scan for nothing (callers wanting the
    # partition-pruned landing layout read ``landing_path`` themselves)
    return dated


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    delimiter: str = ",",
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV read that splits rows into (good, quarantined).

    The reference's ingestion assumes every row parses (all-varchar
    staging, `dags/…:170-188`); typed staging at 100 TB cannot — one
    malformed row must not fail a million-file backfill (FAILFAST) or
    vanish silently (DROPMALFORMED).  PERMISSIVE mode nulls the typed
    columns and preserves the raw line in ``corrupt_col``; splitting on
    its NULL-ness gives an exactly-once partition of the input: every
    line lands in `good` or in `bad` with its original text intact for
    replay after a schema fix.
    """
    full_schema = StructType(schema.fields + [StructField(corrupt_col, StringType())])
    raw = (
        spark.read.options(
            header=True,
            sep=delimiter,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=corrupt_col,
        )
        .schema(full_schema)
        .csv(path)
        .cache()
    )
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = raw.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad
