"""In-worker cProfile of a registered query's Python stages (guide §4.6):
runs the query with Spark's SQL UDF profiler enabled and prints the
aggregated per-UDF stats, so the hot lines inside mapInPandas kernels are
measured where they run instead of guessed at.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python tools/profile_udf_worker.py <query> [<query> ...] [--top N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 25
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.registry import all_queries
    from open_source_etl_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    cfg = EngineConfig(master=f"local[{cpus}]", shuffle_partitions=max(int(cpus), 8))
    spark = build_session(cfg)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")

    queries = all_queries()
    for name in args:
        print(f"\n================ {name} ================")
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        try:
            spark.profile.show(type="perf")
        except Exception as exc:
            print(f"profiler show failed: {exc}")
        try:
            spark.profile.clear()
        except Exception:
            pass
    spark.stop()


if __name__ == "__main__":
    main()
