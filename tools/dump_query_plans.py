#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries into plans/<tag>/.

Usage:
  python tools/dump_query_plans.py --tag r09 --suffix before [name ...]

Writes plans/<tag>/<name>_<suffix>.txt for each query — the judge-facing
evidence files for optimization rounds (plan claims in OPTIMIZATION_*.md
are checked against these). Defaults to the bench headline set.

Uses the same local-bench posture as bench.py (AQE off, 16 shuffle
partitions below 1 GiB of input) so the dumped plan is the plan the bench
actually executes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    total_bytes = sum(
        os.path.getsize(os.path.join(args.sf_dir, f))
        for f in os.listdir(args.sf_dir)
        if f.endswith(".parquet")
    )
    if total_bytes < 1 << 30:
        os.environ.setdefault("SPARK_GRAFT_AQE", "false")
        os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")

    from bench import HEADLINE
    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.workload import QUERIES

    names = args.names or list(HEADLINE)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump-query-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan.rstrip() + "\n")
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
