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

Exit code 1 if any regression crosses the bar (CI-able).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = sys.argv[1]
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    new = json.load(open(path))
    base = json.load(open("BENCH_LOCAL.json"))
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
    return 1 if regs else 0


if __name__ == "__main__":
    raise SystemExit(main())
