"""Write a committed COMPARE_*.json differential artifact.

Usage:
    python tools/run_compare.py --sf-dir /root/testdata/sf0.01 --out COMPARE_r10.json
    python tools/run_compare.py --sf-dir /root/repo/.genscale/sf1 --out COMPARE_sf1_full.json --py-oracle
    python tools/run_compare.py --sf-dir ... --out ... --names a,b,c [--excluded name=reason ...]

Runs compare_queries over the full oracle registry (or --names) and dumps
the artifact in the committed shape: per-query verdicts plus _sf_dir /
_scale / _n / _failures / _wall_s / _protocol meta keys (_excluded when
given). Exit code 1 on any non-match verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--names", default=None, help="comma-separated query subset")
    ap.add_argument("--py-oracle", action="store_true")
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument(
        "--excluded",
        action="append",
        default=[],
        metavar="NAME=REASON",
        help="record a deliberate exclusion (repeatable)",
    )
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    from spark_cherry_shuffle_service_spark.plans.differential import compare_queries
    from spark_cherry_shuffle_service_spark.session import get_spark

    spark = get_spark(app_name="compare-artifact", shuffle_partitions=args.parallelism)
    names = args.names.split(",") if args.names else None
    excluded = dict(e.split("=", 1) for e in args.excluded)
    if names:
        names = [n for n in names if n not in excluded]
        if not names:
            # ADVICE r10: an all-excluded --names list must NOT fall through
            # to a full-registry run (a falsy [] reads as "no subset" —
            # potentially hours at a generated SF). Fail loudly instead.
            ap.error("--names minus --excluded leaves no queries to compare")
    t0 = time.perf_counter()
    results = compare_queries(
        spark, args.sf_dir, names, prefer_py_oracle=args.py_oracle
    )
    if not names:
        results = {k: v for k, v in results.items() if k not in excluded}
    wall = time.perf_counter() - t0
    failures = sum(not v.startswith(("match", "SKIP")) for v in results.values())
    scale = args.scale
    if scale is None:
        tag = os.path.basename(os.path.normpath(args.sf_dir))
        try:
            scale = float(tag.removeprefix("sf"))
        except ValueError:
            scale = -1.0
    payload: dict = {
        "_sf_dir": args.sf_dir,
        "_scale": scale,
        "_n": len(results),
        "_failures": failures,
        "_wall_s": round(wall, 1),
        "_protocol": (
            "compare_queries over "
            + ("the named subset" if names else "every registered oracle query")
            + (" (prefer_py_oracle)" if args.py_oracle else "")
        ),
    }
    if excluded:
        payload["_excluded"] = excluded
    payload.update(dict(sorted(results.items())))
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"out": args.out, "n": len(results), "failures": failures, "wall_s": round(wall, 1)}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
