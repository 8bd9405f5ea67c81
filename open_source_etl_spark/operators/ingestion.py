"""Ingestion-semantics queries: the reference pipeline's computations as
oracle-checkable operators over the fixture tables.

The library implementation lives in ``open_source_etl_spark.ingest``;
these queries prove the date-partition math, metadata value synthesis,
provenance, and all-varchar staging projection against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "partition_path_derivation",
    oracle="""
    SELECT
      o_orderkey,
      EXTRACT(YEAR FROM o_orderdate) AS year,
      lower(monthname(o_orderdate)) AS month,
      EXTRACT(DAY FROM o_orderdate) AS day,
      CONCAT_WS('/',
        CAST(EXTRACT(YEAR FROM o_orderdate) AS VARCHAR),
        lower(monthname(o_orderdate)),
        CAST(EXTRACT(DAY FROM o_orderdate) AS VARCHAR)) || '/' AS partition_suffix
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def partition_path_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference partitioner's year/month/day path math
    (`include/scripts/file_services/partitioner.py:7-25`: month is the
    lowercase full English month name) as column expressions."""
    orders = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    month = F.lower(F.date_format("o_orderdate", "MMMM"))
    day = F.dayofmonth("o_orderdate")
    return (
        orders.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            year.alias("year"),
            month.alias("month"),
            day.alias("day"),
            F.concat(
                F.concat_ws("/", year.cast("string"), month, day.cast("string")),
                F.lit("/"),
            ).alias("partition_suffix"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "metadata_value_synthesis",
    oracle="""
    WITH meta(m_key, m_key_type) AS (
      VALUES ('bundesliga_match_scores', 'transactional'),
             ('laliga_match_scores', 'transactional'),
             ('premierleague_match_scores', 'reference_data')
    )
    SELECT
      m_key,
      m_key_type,
      m_key_type || '/' || m_key || '/' || '2021/march/7/' AS m_value
    FROM meta
    ORDER BY m_key
    """,
)
def metadata_value_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's metadata UPDATE value concat
    (`dags/…:82-84`: `m_key_type||'/'||entity||'/'||suffix`)."""
    meta = spark.createDataFrame(
        [
            ("bundesliga_match_scores", "transactional"),
            ("laliga_match_scores", "transactional"),
            ("premierleague_match_scores", "reference_data"),
        ],
        "m_key string, m_key_type string",
    )
    return (
        meta.select(
            "m_key",
            "m_key_type",
            F.concat_ws("/", "m_key_type", "m_key", F.lit("2021/march/7/")).alias("m_value"),
        )
        .orderBy("m_key")
    )


@query(
    "file_provenance",
    oracle="""
    SELECT 'region.parquet' AS source_file, COUNT(*) AS n_rows FROM region
    """,
)
def file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-provenance column (reference S3 listing, `dags/…:122-128`):
    `input_file_name()` per row, reduced to basename + count."""
    reg = load_table(spark, sf_dir, "region")
    return (
        reg.withColumn(
            "source_file", F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
        )
        .groupBy("source_file")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "staging_all_varchar",
    oracle="""
    SELECT
      CAST(n_nationkey AS VARCHAR) AS col_1,
      CAST(n_name AS VARCHAR) AS col_2,
      CAST(n_regionkey AS VARCHAR) AS col_3
    FROM nation
    ORDER BY CAST(col_1 AS INTEGER)
    """,
)
def staging_all_varchar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-varchar positional staging projection (the reference's external
    table DDL, `dags/…:174-188`: `col_i varchar AS (value:c{i}::varchar)`)."""
    nat = load_table(spark, sf_dir, "nation")
    cols = [
        F.col(c).cast("string").alias(f"col_{i + 1}") for i, c in enumerate(nat.columns)
    ]
    return nat.select(*cols).orderBy(F.col("col_1").cast("int"))


@query(
    "ingest_pipeline_run",
    # the staging view is schema-on-read all-varchar over the raw CSV —
    # the oracle casts the source rows to VARCHAR with the same names
    oracle="""
    SELECT
      CAST(n_nationkey AS VARCHAR) AS data_id,
      n_name AS name,
      CAST(n_regionkey AS VARCHAR) AS regionkey,
      '2021-03-06' AS date
    FROM nation
    ORDER BY CAST(data_id AS BIGINT)
    """,
)
def ingest_pipeline_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ENTIRE ingestion DAG as one t2 query: metadata
    key-type lookup → file sensing → run-date partition suffix →
    metadata partition-value upsert + read-back → date-partitioned
    landing → header-sniff schema resolution ('Unnamed: 0' → data_id,
    `dags/…:170`) → all-varchar external staging view — then the staged
    rows are returned for the differential check.  The CSV feed is
    derived from the nation fixture so the oracle can reproduce the
    staged content exactly (schema-on-read: every column VARCHAR).
    """
    import datetime as _dt
    import tempfile as _tf

    from ..ingest.metadata import MetadataStore
    from ..ingest.pipeline import run_ingestion

    workdir = _tf.mkdtemp(prefix="osetl-ingest-q-")
    # the raw feed: CSV with the reference's unnamed index column
    nation = load_table(spark, sf_dir, "nation").orderBy("n_nationkey")
    feed = nation.select(
        F.col("n_nationkey").cast("string").alias("Unnamed: 0"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("string").alias("regionkey"),
        F.lit("2021-03-06").alias("date"),
    )
    feed.coalesce(1).write.mode("overwrite").option("header", True).csv(
        f"{workdir}/raw"
    )

    meta = MetadataStore(spark, f"{workdir}/metadata")
    meta.upsert("nation_feed", key_type="incremental", value=None)
    result = run_ingestion(
        spark,
        entity="nation_feed",
        source_glob=f"{workdir}/raw/*.csv",
        landing_root=f"{workdir}/landing",
        metadata=meta,
        run_date=_dt.date(2021, 3, 6),
        date_column="date",
    )
    assert result is not None and result.staged_rows > 0
    from ._localize import localize

    return localize(
        spark.table(result.staging_view).orderBy(F.col("data_id").cast("bigint")),
        workdir,
    )
