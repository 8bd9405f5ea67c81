"""Property-based tests (hypothesis) for the engine's pure-Python parts.

The reference has no property testing (SURVEY.md §5); these cover the
driver-side functions whose bugs would silently skew distributed results:
partition-path math and the oracle canonicalization the whole parity
suite trusts.
"""

from __future__ import annotations

import datetime as dt
import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_etl_spark.ingest.partitioner import MONTH_NAMES, partition_suffix
from open_source_etl_spark.oracle import canonical_rows

dates = st.dates(min_value=dt.date(1970, 1, 1), max_value=dt.date(2100, 12, 31))


@given(dates)
def test_partition_suffix_matches_strftime_rule(d):
    """The engine rule must equal the reference's formatting exactly:
    month = strftime('%B').lower(), year/day = plain ints, trailing
    slash (`partitioner.py:13-25`)."""
    assert partition_suffix(d) == f"{d.year}/{d.strftime('%B').lower()}/{d.day}/"


@given(dates)
def test_partition_suffix_roundtrips(d):
    year, month, day, tail = partition_suffix(d).split("/")
    assert tail == ""
    assert dt.date(int(year), MONTH_NAMES.index(month) + 1, int(day)) == d


_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(alphabet=string.printable, max_size=20),
    st.booleans(),
)


@st.composite
def tables(draw):
    n_cols = draw(st.integers(min_value=1, max_value=5))
    cols = [f"c{i}" for i in range(n_cols)]
    n_rows = draw(st.integers(min_value=0, max_value=8))
    rows = [
        tuple(draw(_cell) for _ in range(n_cols)) for _ in range(n_rows)
    ]
    return cols, rows


@given(tables(), st.randoms())
@settings(max_examples=60)
def test_canonical_rows_is_permutation_invariant(table, rnd):
    """The oracle compare sorts rows and columns — shuffling either must
    not change the canonical form (this is what makes the value-hash
    order-insensitive)."""
    cols, rows = table
    base = canonical_rows(cols, rows)

    shuffled_rows = rows[:]
    rnd.shuffle(shuffled_rows)
    assert canonical_rows(cols, shuffled_rows) == base

    perm = list(range(len(cols)))
    rnd.shuffle(perm)
    perm_cols = [cols[i] for i in perm]
    perm_rows = [tuple(r[i] for i in perm) for r in rows]
    assert canonical_rows(perm_cols, perm_rows) == base


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_canonical_float_tolerates_one_ulp(x):
    """Two floats within 1 ulp must canonicalize identically unless the
    9-significant-digit representation legitimately differs — the
    guarantee the parity suite leans on for engine-order noise."""
    import math

    y = math.nextafter(x, math.inf)
    cx, cy = canonical_rows(["v"], [(x,)]), canonical_rows(["v"], [(y,)])
    if f"{x:.9g}" == f"{y:.9g}":
        assert cx == cy
