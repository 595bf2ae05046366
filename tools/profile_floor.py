#!/usr/bin/env python
"""Job-floor decomposition for registered queries (guide §1).

For each query, measures per iteration:
  - construct  : seconds to build the DataFrame (py4j Column/plan
                 construction PLUS any probe/collect jobs a driver-regime
                 query runs while deciding its regime)
  - exec       : seconds for the noop-sink execution of the built frame
  - jobs       : number of Spark jobs launched across construct+exec
                 (scheduling floors: each job is ~10-40 ms of fixed cost
                 at local[32] even on empty work)

min-of-N on construct/exec; jobs from the last iteration (deterministic).

Usage: python tools/profile_floor.py [--sf-dir DIR] [--iters N] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.workload import QUERIES

    names = args.names or []
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="profile-floor")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["count_star"](spark, args.sf_dir).collect()
    tracker = spark.sparkContext.statusTracker()

    out: dict[str, dict] = {}
    for n in names:
        best_c = best_e = float("inf")
        jobs = 0
        for _ in range(args.iters + 1):  # first = warmup/codegen
            group = f"floor:{n}:{time.monotonic_ns()}"
            spark.sparkContext.setJobGroup(group, n)
            t0 = time.perf_counter()
            df = QUERIES[n](spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_c = min(best_c, t1 - t0)
            best_e = min(best_e, t2 - t1)
            jobs = len(tracker.getJobIdsForGroup(group))
            spark.sparkContext.setJobGroup(None, None)
        out[n] = {
            "construct": round(best_c, 3),
            "exec": round(best_e, 3),
            "jobs": jobs,
        }
        print(f"[floor] {n}: {out[n]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
