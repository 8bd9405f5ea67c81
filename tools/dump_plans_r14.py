"""Dump .explain("formatted") for a list of queries into plans/r14/.

Usage: python tools/dump_plans_r14.py <suffix> <query> [<query> ...]
Writes plans/r14/<query>_<suffix>.txt for each query, built against
sf0.01 (plan shape only; nothing is executed beyond eager
localCheckpoints some pipelines run at build time).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.registry import all_queries
    from open_source_etl_spark.session import build_session

    cfg = EngineConfig(master="local[4]", shuffle_partitions=8)
    spark = build_session(cfg)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, "/root/testdata/sf0.01")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
