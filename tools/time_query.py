"""Micro-timer for a single registered query — the per-query half of the
BENCH_AB_HOSTDRIFT adjudication method (CLAUDE.md: never compare raw
totals across host windows; always pair a timing with the fixed
calibration probe from bench.py).

Usage: python tools/time_query.py <query_name> [runs] [sf_dir]
Prints ONE JSON line: {"query":..., "runs":[...], "best":..., "median":...,
"calibration_sec":...}. Run in a FRESH process per code variant (the
cacheManager gotcha: a warm session silently reuses cached plans).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_cherry_shuffle_service_spark.plans.registry import all_specs
    from spark_cherry_shuffle_service_spark.session import get_spark

    spark = get_spark(app_name=f"time-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    def probe() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 16_000_000, 1, 32)
            .selectExpr("substring(md5(cast(id AS string)), 1, 4) AS k")
            .groupBy("k")
            .count()
            .selectExpr("sum(count) AS s", "count(*) AS n")
            .collect()
        )
        return time.perf_counter() - t0

    cal = min(round(probe(), 3) for _ in range(3))

    builder = all_specs()[name].builder
    runs = []
    for _ in range(n_runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        builder(spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    s = sorted(runs)
    med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs": runs,
                "best": min(runs),
                "median": round(med, 3),
                "calibration_sec": cal,
            }
        )
    )


if __name__ == "__main__":
    main()
