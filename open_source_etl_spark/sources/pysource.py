"""Custom Python data source (PySpark 4 DataSource API): a deterministic
synthetic-events generator, the engine's equivalent of the reference's
"sense a feed and pull it in" entry point (`dags/…:56-66`) for load tests
and CI fixtures that must not depend on external files.

Scale design: the generator is PARTITIONED — the driver plans N splits
and each executor task synthesizes its own row range from pure arithmetic
on the row index (a splitmix64-style mixer, no RNG object, no state), so
generation parallelizes exactly like a parquet scan and is reproducible
across runs, partition counts, and engines.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

SYNTH_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _mix64(x: int) -> int:
    """splitmix64 finalizer (public-domain constant set): a bijective
    64-bit mixer — deterministic, stateless, uniform enough for synthetic
    data."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.num_rows = int(options.get("numrows", 1000))
        self.num_partitions = int(options.get("numpartitions", 4))
        self.num_users = int(options.get("numusers", 100))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.num_rows // self.num_partitions)
        return [
            _RangePartition(i * per, min((i + 1) * per, self.num_rows))
            for i in range(self.num_partitions)
            if i * per < self.num_rows
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            h = _mix64(i)
            yield (
                i,
                h % self.num_users,
                _EVENT_TYPES[(h >> 8) % len(_EVENT_TYPES)],
                round(((h >> 16) % 10_000) / 100.0, 2),
            )


class SyntheticEventsSource(DataSource):
    """`spark.read.format("synthetic_events").option("numRows", …)` after
    `spark.dataSource.register(SyntheticEventsSource)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return SYNTH_SCHEMA

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)
