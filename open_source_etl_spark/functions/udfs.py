"""User-defined function surface (EXT, SURVEY.md §2B): Arrow-vectorized
pandas UDF (scalar), grouped-aggregate pandas UDF (UDAF), and a Python
UDTF.

UDFs are the engine's slow path — everything expressible in built-in
``pyspark.sql.functions`` stays JVM-side in whole-stage codegen (see
every other operator module).  These exist to prove the escape hatch:
when Python is unavoidable, Arrow batching keeps the transfer columnar
(~10-100× over row-at-a-time UDFs), and the kernels below are written the
way a real one should be — vectorized numpy inside, no per-row Python in
the batch loop except where row expansion is the semantic.
"""

import pandas as pd  # noqa: TCH002 - pandas_udf infers kinds from real annotations
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# DataType objects, not DDL strings: string return types are parsed with
# the active session's parser at decoration time, which would make this
# module unimportable before a SparkSession exists (e.g. pytest collection)
_CHUNK_SCHEMA = StructType(
    [
        StructField("chunk_idx", IntegerType()),
        StructField("chunk", StringType()),
        StructField("chunk_len", IntegerType()),
    ]
)


@pandas_udf(DoubleType())
def net_revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Scalar pandas UDF: price × (1 − discount), vectorized over Arrow
    batches.  IEEE double arithmetic — bit-identical to the same
    expression in any SQL engine, so it oracle-checks without rounding."""
    return price * (1.0 - discount)


@pandas_udf(LongType())
def exact_cents_sum(price: pd.Series) -> int:
    """Grouped-aggregate pandas UDF (UDAF): sum of prices in integer
    cents.  Fixed-point accumulation is order-independent (exact integer
    adds), so the result is reproducible across partitionings — the same
    parity trick the built-in aggregates use via DECIMAL
    (functions/parity.py)."""
    return int(price.mul(100.0).round().astype("int64").sum())


@pandas_udf(LongType())
def group_size(price: pd.Series) -> int:
    """Grouped-aggregate pandas UDF counting group rows.  Exists because
    Spark forbids mixing pandas and JVM aggregates in one ``agg()`` —
    an all-pandas aggregation list is the supported shape."""
    return int(len(price))


@udtf(returnType=_CHUNK_SCHEMA)
class ChunkText:
    """Python UDTF: fixed-width character chunking (the LLM-context-window
    document splitter).  One input row expands to ceil(len/width) chunk
    rows — table-function semantics built-ins can't express directly."""

    def eval(self, text: str, width: int):  # noqa: D102
        if text is None:
            return
        for i in range(0, len(text), width):
            chunk = text[i : i + width]
            yield i // width, chunk, len(chunk)


def register_all(spark) -> None:
    """Register the UDF surface with the session catalog for SQL use."""
    spark.udf.register("net_revenue", net_revenue)
    spark.udf.register("exact_cents_sum", exact_cents_sum)
    spark.udf.register("group_size", group_size)
    spark.udtf.register("chunk_text", ChunkText)


__all__ = [
    "net_revenue",
    "exact_cents_sum",
    "group_size",
    "ChunkText",
    "register_all",
    "F",
]
