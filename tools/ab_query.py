#!/usr/bin/env python
"""Same-window A/B of one query between two repo checkouts.

Runs the query from checkout A and checkout B in SEPARATE subprocesses
(fresh JVM each, same bench posture as bench.py), interleaved A B A B …,
and reports per-run cold/warm. Interleaving inside one window is the only
comparison this host's 2-3x CPU swings allow.

Usage: python tools/ab_query.py --query NAME --a DIR --b DIR [--sf-dir D]
       [--rounds 2] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
name, sf_dir, iters = sys.argv[2], sys.argv[3], int(sys.argv[4])
total_bytes = sum(
    os.path.getsize(os.path.join(sf_dir, f))
    for f in os.listdir(sf_dir) if f.endswith(".parquet"))
if total_bytes < 1 << 30:
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")
from delta_unity_duckdb_spark.session import get_spark
from delta_unity_duckdb_spark.workload import QUERIES
spark = get_spark(app_name="ab-query")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["count_star"](spark, sf_dir).collect()
t0 = time.perf_counter()
QUERIES[name](spark, sf_dir).toPandas()
cold = time.perf_counter() - t0
best = float("inf")
for _ in range(iters):
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).toPandas()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"cold": round(cold, 3), "warm": round(best, 3)}))
"""


def run_one(root: str, name: str, sf_dir: str, iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, root, name, sf_dir, str(iters)],
        capture_output=True, text=True, cwd=root,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"err": (out.stderr or out.stdout)[-400:]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--a", required=True, help="checkout A (e.g. old worktree)")
    ap.add_argument("--b", default="/root/repo", help="checkout B")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    runs = {"a": [], "b": []}
    for r in range(args.rounds):
        for side, root in (("a", args.a), ("b", args.b)):
            res = run_one(root, args.query, args.sf_dir, args.iters)
            runs[side].append(res)
            print(f"[ab] round {r} {side} ({root}): {res}",
                  file=sys.stderr, flush=True)
    summary = {
        "query": args.query, "sf_dir": args.sf_dir,
        "a_root": args.a, "b_root": args.b,
        "runs": runs,
        "a_warm_min": min((x.get("warm", float("inf")) for x in runs["a"]),
                          default=None),
        "b_warm_min": min((x.get("warm", float("inf")) for x in runs["b"]),
                          default=None),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
