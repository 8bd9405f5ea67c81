"""Benchmark harness: time every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Timing protocol: one warm SparkSession; per query, build the plan and run a
``count()``-free materialization (``collect`` on bounded results,
``write.format("noop")`` for large ones is avoided — results here are all
presentation-sized or filtered, and the driver's contract collects too).
A tiny warm-up query runs first so JVM/codegen startup isn't billed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.registry import all_queries
    from open_source_etl_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(master=f"local[{cpus}]", shuffle_partitions=max(int(cpus), 8))
    spark = build_session(cfg)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM / codegen path outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in sorted(all_queries().items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            _ = len(rows)
        except Exception as exc:  # keep benching the rest
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = None
    try:
        tail = os.path.basename(sf_dir.rstrip("/"))
        if tail.startswith("sf"):
            sf = float(tail[2:])
    except ValueError:
        pass

    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
