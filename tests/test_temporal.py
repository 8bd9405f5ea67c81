"""functions.temporal.asof_join vs a brute-force Python reference."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from open_source_etl_spark.functions.temporal import asof_join


def _ts(minutes: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    rnd = random.Random(11)
    trades = [
        (k, _ts(rnd.randint(0, 500)), float(i))
        for i, k in enumerate(k for k in (1, 2, 3) for _ in range(25))
    ]
    quotes = [
        (k, _ts(rnd.randint(0, 500)), 100.0 + i)
        for i, k in enumerate(k for k in (1, 2) for _ in range(20))
    ]
    t = spark.createDataFrame(trades, "key long, t_ts timestamp, qty double")
    q = spark.createDataFrame(quotes, "key long, q_ts timestamp, price double")
    return trades, quotes, t, q


def _brute(trades, quotes, direction, tol=None):
    out = {}
    for k, ts, qty in trades:
        cands = [(qts, p) for (qk, qts, p) in quotes if qk == k]
        back = [c for c in cands if c[0] <= ts]
        fwd = [c for c in cands if c[0] >= ts]
        # tie rule mirrors the engine: duplicate right timestamps resolve
        # to the greatest payload backward, the smallest forward
        best = None
        if direction == "backward" and back:
            best = max(back)
        elif direction == "forward" and fwd:
            best = min(fwd)
        elif direction == "nearest":
            b = max(back) if back else None
            f = min(fwd) if fwd else None
            if b and f:
                best = b if (ts - b[0]) <= (f[0] - ts) else f
            else:
                best = b or f
        if best is not None and tol is not None:
            if abs((best[0] - ts).total_seconds()) > tol:
                best = None
        out[(k, ts, qty)] = best
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_matches_bruteforce(frames, direction):
    trades, quotes, t, q = frames
    got = {
        (r.key, r.t_ts, r.qty): (r.q_ts_right, r.price_right)
        for r in asof_join(
            t, q, on="key", left_ts="t_ts", right_ts="q_ts", direction=direction
        ).collect()
    }
    expect = _brute(trades, quotes, direction)
    assert len(got) == len(trades)
    for k, best in expect.items():
        if best is None:
            assert got[k] == (None, None), (k, got[k])
        else:
            assert got[k] == best, (k, got[k], best)


def test_asof_join_tolerance_drops_far_matches(frames):
    trades, quotes, t, q = frames
    got = {
        (r.key, r.t_ts, r.qty): (r.q_ts_right, r.price_right)
        for r in asof_join(
            t,
            q,
            on="key",
            left_ts="t_ts",
            right_ts="q_ts",
            direction="nearest",
            tolerance_seconds=600,
        ).collect()
    }
    expect = _brute(trades, quotes, "nearest", tol=600)
    hits = sum(1 for v in expect.values() if v is not None)
    assert 0 < hits < len(trades)  # the bound actually bites
    for k, best in expect.items():
        assert got[k] == (best or (None, None)), k


def test_asof_join_same_timestamp_is_admissible(spark):
    t = spark.createDataFrame(
        [(1, _ts(10), 5.0)], "key long, t_ts timestamp, qty double"
    )
    q = spark.createDataFrame(
        [(1, _ts(10), 42.0)], "key long, q_ts timestamp, price double"
    )
    back = asof_join(t, q, "key", "t_ts", "q_ts", "backward").first()
    fwd = asof_join(t, q, "key", "t_ts", "q_ts", "forward").first()
    assert back.price_right == 42.0
    assert fwd.price_right == 42.0
