"""Bucketed tables: co-located, shuffle-free fact⋈fact joins
(SURVEY.md §2B "bucketing for co-located joins").

Broadcast handles dim joins; when BOTH sides are big (lineitem⋈orders at
100 TB), every query pays a full shuffle of both facts — unless the
tables are bucketed on the join key at write time.  Matching bucket
counts + key ⇒ Spark plans a sort-merge join with zero Exchange: the
shuffle happened once, at ingestion, and is amortized over every
subsequent join.  tests/test_bucketing.py asserts the no-Exchange plan.

Bucket-count choice at scale: target ~100-200 MB per bucket file per
partition; too few buckets re-creates skew, too many makes small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table.
    Sorting within buckets lets the join skip its sort phase too.

    The input is repartitioned on the bucket key into n_buckets tasks
    first: a bucketed write emits one file per (task, bucket) pair, so an
    unaligned N-partition input produces N x n_buckets fragment files —
    slow to commit, slow to scan, and at 100 TB a small-file storm.
    Aligning task hashing with bucket hashing collapses that to exactly
    one file per bucket."""
    df = df.repartition(n_buckets, key)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With matching
    bucket specs Catalyst satisfies both sides' distribution requirements
    from the file layout — no Exchange in the plan."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
