"""Row-level MERGE INTO over parquet targets (SURVEY.md §2A.2 #13-14:
the reference's Snowflake-side UPDATE/MERGE semantics, re-expressed
without a warehouse).

`overwrite_partitions` (readers.py) gives partition-granularity upsert;
this module gives ROW granularity: the classic
``MERGE INTO target USING source ON key
  WHEN MATCHED [AND cond] THEN UPDATE | DELETE
  WHEN NOT MATCHED THEN INSERT``
computed as one full-outer join and rewritten atomically.

Scale design: the merge is a single key-partitioned full-outer join —
the same shuffle a warehouse MERGE performs — and the rewrite goes
through a staging directory + atomic rename, so readers never observe a
half-written table.  Without a commit log (Delta/Iceberg), concurrent
writers are out of scope — same contract as the reference's
single-active-DAG runs (`max_active_runs=1`,
`dags/ingest_bundesliga_match_scores.py:32`).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    insert_not_matched: bool = True,
) -> DataFrame:
    """MERGE ``source`` into the parquet table at ``target_path``.

    - matched + ``when_matched_delete`` true → row removed;
    - matched otherwise → columns overwritten by ``when_matched_update``
      (default: every source column replaces its target namesake);
    - unmatched source rows → inserted when ``insert_not_matched``.

    Returns the merged DataFrame (re-read from the committed path).
    """
    target = spark.read.parquet(target_path)
    t_cols = target.columns
    src = source.select(
        *[F.col(c).alias(f"__src_{c}") for c in source.columns]
    )
    cond = None
    for k in key_cols:
        piece = target[k] == src[f"__src_{k}"]
        cond = piece if cond is None else (cond & piece)
    joined = target.join(src, cond, "full_outer")

    matched = None
    for k in key_cols:
        piece = target[k].isNotNull() & src[f"__src_{k}"].isNotNull()
        matched = piece if matched is None else (matched & piece)
    src_only = target[key_cols[0]].isNull() & src[f"__src_{key_cols[0]}"].isNotNull()

    if when_matched_update is None:
        when_matched_update = {
            c: F.col(f"__src_{c}") for c in source.columns if c not in key_cols
        }

    out_cols = []
    for c in t_cols:
        updated = when_matched_update.get(c, F.col(c))
        inserted = (
            F.col(f"__src_{c}") if c in source.columns else F.lit(None).cast(target.schema[c].dataType)
        )
        out_cols.append(
            F.when(matched, updated).when(src_only, inserted).otherwise(F.col(c)).alias(c)
        )
    rows = joined
    if when_matched_delete is not None:
        rows = rows.filter(~(matched & when_matched_delete))
    if not insert_not_matched:
        rows = rows.filter(~src_only)
    merged = rows.select(*out_cols)

    # stage → atomic swap: write the new table beside the old one and
    # rename into place, so a crash mid-write never corrupts the target
    staging = os.path.join(
        tempfile.gettempdir(), f"osetl-merge-{uuid.uuid4().hex[:12]}"
    )
    merged.write.mode("overwrite").parquet(staging)
    backup = target_path.rstrip("/") + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(target_path, backup)
    try:
        shutil.move(staging, target_path)
    except Exception:
        os.rename(backup, target_path)  # roll back
        raise
    shutil.rmtree(backup)
    return spark.read.parquet(target_path)
