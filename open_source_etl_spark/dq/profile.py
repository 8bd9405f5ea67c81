"""One-pass table profiling (GEN of SURVEY.md §2A.3: the summary layer a
DQ suite is written against — you author expectations by reading a
profile first).

The whole profile is ONE aggregation job regardless of column count:
every per-column statistic (nulls, approx distinct, min/max, mean for
numerics) is an aggregate expression in a single `agg(...)`, so a
100-column 100 TB table is scanned once, with partial aggregation
map-side — never one job per column (the pandas-profiling trap).
The 1-row wide result is reshaped to long form driver-side for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_NULL = "∅"


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns a long-form DataFrame (column, metric, value:string) with
    metrics: count, nulls, approx_distinct, min, max, and mean for
    numeric columns.  approx_distinct is HLL++ (fixed memory per column).
    """
    cols = columns or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
        if c in numeric:
            aggs.append(F.avg(c).cast("string").alias(f"{c}__mean"))
    wide = df.agg(*aggs).collect()[0].asDict()

    n = wide["__rows"]
    out = []
    for c in cols:
        metrics = {
            "count": str(n),
            "nulls": str(n - wide[f"{c}__nonnull"]),
            "approx_distinct": str(wide[f"{c}__distinct"]),
            "min": wide[f"{c}__min"] if wide[f"{c}__min"] is not None else _NULL,
            "max": wide[f"{c}__max"] if wide[f"{c}__max"] is not None else _NULL,
        }
        if c in numeric:
            metrics["mean"] = wide[f"{c}__mean"] if wide[f"{c}__mean"] is not None else _NULL
        for m, v in metrics.items():
            out.append(Row(column=c, metric=m, value=v))
    return df.sparkSession.createDataFrame(out)
