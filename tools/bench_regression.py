"""Compare a bench.py JSON output against the recorded per-query bar.

Usage: python tools/bench_regression.py <bench.json> [threshold=2.0]

`BENCH_LOCAL.json` records the per-query MINIMUM wall-clock across quiet
full runs (BASELINE.md "Round-2 note": single-run times on this host
spread up to 10x on sub-second queries from hypervisor steal, so a
single-run comparison against another single run mostly measures the
host).  This tool prints every query whose new time exceeds
threshold x its recorded minimum AND 0.8 s absolute — the second guard
keeps sub-second jitter out of the report — plus totals, so a round's
BENCH_r{N} can be triaged in seconds.

It also prints a STALE-FLOOR section: queries whose recorded minimum
has not been approached (within 1.25x) by any of the LAST THREE
recorded BENCH_r*.json rounds.  A floor that old usually predates the
current implementation generation (the multimodal_bmp_rle8 pattern:
a floor set by a leaner early decoder ratchets into unreachable
territory as the module grows) and should either be investigated or
HONESTLY REBASED.  Rebasing protocol (BASELINE.md round-5 note):
rebasing the floor to the current quiet-host minimum is legitimate
ONLY with a written cause in BASELINE.md naming what structurally
changed (e.g. "decode table generation moved in-module, +0.3 s fixed
cost per worker"); silently deleting a floor is not.

Exit code 1 if any regression crosses the bar (CI-able); stale floors
alone do not fail the run.
"""

from __future__ import annotations

import glob
import json
import re
import sys


def _bench_json(d: dict) -> dict:
    """Unwrap a driver-recorded BENCH_r{N}.json (the per-query map
    sits under 'parsed') or a raw bench.py output."""
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def stale_floors(base_queries: dict, window: int = 3) -> list:
    """Queries whose BENCH_LOCAL floor no recent round approached:
    returns (name, floor, best_recent, last_round_achieved|None)."""
    rounds = []
    for p in glob.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json$", p)
        if m:
            try:
                rounds.append(
                    (int(m.group(1)), _bench_json(json.load(open(p))))
                )
            except Exception:
                continue
    rounds.sort()
    if len(rounds) < window:
        return []
    recent = rounds[-window:]
    out = []
    for name, floor in base_queries.items():
        if floor <= 0.4:
            continue  # sub-jitter floors carry no signal
        recent_times = [
            r["queries"][name] for _n, r in recent
            if name in r.get("queries", {})
        ]
        if not recent_times:
            continue  # new query, no history yet
        best_recent = min(recent_times)
        if best_recent > 1.25 * floor:
            achieved = None
            for n, r in rounds:
                t = r.get("queries", {}).get(name)
                if t is not None and t <= 1.25 * floor:
                    achieved = n
            out.append((name, floor, best_recent, achieved))
    return out


def main() -> int:
    path = sys.argv[1]
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    new = _bench_json(json.load(open(path)))
    base = _bench_json(json.load(open("BENCH_LOCAL.json")))
    nq, bq = new["queries"], base["queries"]
    comparable = {k: v for k, v in nq.items() if k in bq}
    print(
        f"new total {new['value']:.1f}s over {len(nq)} queries; "
        f"bar total {base['value']:.1f}s over {len(bq)}; "
        f"comparable subset {sum(comparable.values()):.1f}s vs "
        f"{sum(bq[k] for k in comparable):.1f}s"
    )
    regs = []
    for k, v in sorted(comparable.items()):
        if v > threshold * bq[k] and v > 0.8:
            regs.append((k, bq[k], v))
    for k, o, v in regs:
        print(f"REG {k}: {o:.2f}s -> {v:.2f}s ({v / o:.1f}x)")
    for k in sorted(set(nq) - set(bq)):
        print(f"NEW {k}: {nq[k]:.2f}s (no bar yet)")
    if not regs:
        print("no regressions over the bar")
    stale = stale_floors(bq)
    for k, floor, best, achieved in sorted(stale):
        since = (
            f"last achieved round {achieved}" if achieved is not None
            else "never achieved in the recorded rounds"
        )
        print(
            f"STALE FLOOR {k}: bar {floor:.2f}s, best of the last 3 "
            f"rounds {best:.2f}s ({since}) — investigate or rebase "
            "with a written cause in BASELINE.md"
        )
    if not stale:
        print("no stale floors")
    return 1 if regs else 0


if __name__ == "__main__":
    raise SystemExit(main())
