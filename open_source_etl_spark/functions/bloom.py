"""Bloom-filter runtime semi-join reduction (SURVEY.md §2B scale notes).

The pattern: a big fact table joins a much smaller (but not
broadcast-hash-join-cheap) key set, and most fact rows will NOT match.
A shuffle join moves the whole fact table; a bloom filter built from the
key side and applied before the shuffle drops the guaranteed-non-matching
rows at scan time, shrinking the exchange by the selectivity factor.
This is Spark's own `spark.sql.optimizer.runtime.bloomFilter` idea made
explicit and available to Python callers (PySpark exposes no
`df.stat.bloomFilter`).

Design:
- Keys hash JVM-side with ``xxhash64`` (one pass over the key set); only
  the 64-bit hashes cross to the driver, not the key values.
- The filter itself is a numpy bit array with ``k`` probes derived from
  the 64-bit hash by double hashing (h1 + i*h2 — Kirsch-Mitzenmacher,
  published construction), broadcast once to executors.
- The big side also hashes JVM-side; the Python stage is a vectorized
  Arrow-batched membership test over int64, not per-row Python.

Guarantee: NO false negatives — every true match survives.  False
positives only cost wasted shuffle rows (bounded by ``fpp``); the join
afterwards removes them, so `bloom_prefilter(big, keys).join(keys)` ==
`big.join(keys)` exactly (tests/test_bloom.py proves it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _probe_positions(h: np.ndarray, k: int, m: int) -> list[np.ndarray]:
    """k probe positions per 64-bit hash via double hashing: split the
    hash into two 32-bit halves h1, h2 and probe (h1 + i*h2) mod m."""
    h = h.astype(np.uint64)
    h1 = h >> np.uint64(32)
    h2 = h & np.uint64(0xFFFFFFFF)
    # force h2 odd so successive probes don't collapse when h2 == 0
    h2 = h2 | np.uint64(1)
    return [((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64) for i in range(k)]


def build_bloom(
    keys: DataFrame, key_col: str, fpp: float = 0.01
) -> tuple[np.ndarray, int]:
    """Build a bloom bit-array from the distinct values of ``key_col``.

    Returns (bits, k).  Sizing uses the standard formulas
    m = -n·ln(p)/ln(2)², k = (m/n)·ln(2).  Only 64-bit xxhash64 values
    are collected to the driver — for a dimension-sized key set (the only
    case where this pattern applies) that's a few MB.
    """
    hashes = (
        keys.select(F.xxhash64(F.col(key_col)).alias("h"))
        .distinct()
        .toPandas()["h"]
        .to_numpy(dtype=np.int64)
    )
    n = max(len(hashes), 1)
    m = max(int(-n * np.log(fpp) / (np.log(2) ** 2)), 64)
    # byte-align m: probing recovers m as bits.size * 8, so build and
    # probe MUST agree — an unaligned m silently shifts every probe
    # position and drops true matches (caught by test_bloom_unaligned_m)
    m = ((m + 7) // 8) * 8
    k = max(int(round(m / n * np.log(2))), 1)
    bits = np.zeros(m // 8, dtype=np.uint8)
    for pos in _probe_positions(hashes.view(np.uint64), k, m):
        np.bitwise_or.at(bits, pos // 8, np.left_shift(np.uint8(1), (pos % 8).astype(np.uint8)))
    return bits, k


def bloom_prefilter(
    big: DataFrame, keys: DataFrame, key_col: str, fpp: float = 0.01
) -> DataFrame:
    """Drop ``big`` rows whose ``key_col`` cannot match any key in
    ``keys`` (no false negatives; ~``fpp`` of non-matching rows survive
    to be removed by the real join).  Apply BEFORE a shuffle join to cut
    the exchanged volume."""
    bits, k = build_bloom(keys, key_col, fpp)
    m = int(bits.shape[0]) * 8
    spark = big.sparkSession
    bc = spark.sparkContext.broadcast(bits)

    @pandas_udf(BooleanType())
    def might_contain(h: pd.Series) -> pd.Series:
        arr = h.to_numpy(dtype=np.int64).view(np.uint64)
        out = np.ones(len(arr), dtype=bool)
        b = bc.value
        for pos in _probe_positions(arr, k, m):
            out &= (b[pos // 8] >> (pos % 8).astype(np.uint8)) & 1 == 1
        return pd.Series(out)

    return big.filter(might_contain(F.xxhash64(F.col(key_col))))
