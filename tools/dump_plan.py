"""Dump .explain("formatted") for registered queries to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> <name> [name ...]
Writes <out_dir>/<name>_<suffix>.txt for each query. Explain-only (no
execution), one shared session.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_cherry_shuffle_service_spark.plans.registry import all_specs
    from spark_cherry_shuffle_service_spark.session import get_spark

    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    specs = all_specs()
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({txt.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
