"""bench.py driver-contract test: one JSON line on stdout, required keys.

The driver records bench.py's single stdout line as BENCH_r{N}.json; a
stray print or a schema drift there silently loses the round's numbers.
Runs a two-query subset (SPARK_GRAFT_BENCH_ONLY) at sf0.001 in a fresh
process exactly as the driver would.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_single_json_line_with_contract_keys():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_ONLY="q6_forecast_revenue,filter_point_lookup",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines[:5]}"
    out = json.loads(lines[0])
    assert out["metric"] == "total_query_wall_sec"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    assert set(out["queries"]) == {"q6_forecast_revenue", "filter_point_lookup"}
    assert out["value"] > 0
    assert "failures" not in out


def test_bench_rejects_unknown_query_names():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="2",
        SPARK_GRAFT_BENCH_ONLY="no_such_query",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=180,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 2
    assert "no_such_query" in proc.stderr


def test_stale_floor_detection(tmp_path, monkeypatch):
    """stale_floors flags a bar no recent round approached (within
    1.25x), reports the last round that did, skips sub-jitter floors
    and queries absent from recent records, and unwraps the driver's
    parsed-envelope BENCH_r files."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_regression import stale_floors

    monkeypatch.chdir(tmp_path)
    rounds = {
        7: {"queries": {"a": 1.0, "b": 2.0, "tiny": 0.1}},
        8: {"queries": {"a": 2.9, "b": 2.1, "tiny": 0.3}},
        # driver envelope shape
        9: {"parsed": {"queries": {"a": 3.0, "b": 2.2, "tiny": 0.3}}},
        10: {"queries": {"a": 3.1, "b": 1.9, "tiny": 0.2}},
    }
    for n, payload in rounds.items():
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps(payload)
        )
    base = {"a": 1.0, "b": 2.0, "tiny": 0.1, "absent": 5.0}
    out = stale_floors(base)
    names = {n for n, *_ in out}
    # a: floor 1.0, best of r08-r10 = 2.9 > 1.25 -> stale, achieved r07
    assert names == {"a"}
    _n, floor, best, achieved = out[0]
    assert floor == 1.0 and best == 2.9 and achieved == 7
    # b stays inside 1.25x; tiny is sub-jitter; absent has no history
