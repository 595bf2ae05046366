#!/usr/bin/env python
"""Three-arm scale bench: the SAME queries, same fixtures, measured
back-to-back in one host window on (1) a real multi-process standalone
cluster (tools/cluster_sim.py's master + workers, executors with NO repo
PYTHONPATH), (2) single-process local[N], and (3) DuckDB.

Purpose (round-7 verdict item 1): the sf100 single-host rows that sit
>2x vs DuckDB (pricing_summary, group_aggs, bm25_topk,
token_budget_mixture) are attributed to single-process parquet
scan/decode throughput, with "a real cluster splits the scan" asserted
but unmeasured. local[N] already splits row groups across threads inside
ONE JVM; what it cannot show is whether independent executor JVMs (own
parquet reader pools, own GC, own python workers) change the per-core
decode constant. This tool measures exactly that, with the DuckDB side
run in the same window so ratios are comparable.

Usage:
  python tools/bench_cluster_scale.py [--sf-dir D] [--workers N]
      [--cores C] [--mem-gb G] [--iters N] [--local-cpus N]
      [--timeout SEC] [--out FILE] [--skip-arms cluster,local,duck]
      name ...

Protocol per arm per query: cold = first fresh-plan execution, warm =
min of N further fresh-plan executions (full re-plan + re-execution —
same honest protocol as bench.py / bench_pair.py).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_spark_arm(names, sf_dir, iters, out, key, warmup_name="count_star"):
    """Measure each query cold+warm on the CURRENT get_spark session."""
    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.workload import QUERIES

    spark = get_spark(app_name=f"bench-cluster-scale-{key}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES[warmup_name](spark, sf_dir).collect()  # JVM/session warmup
    info = {}
    # Prove which execution regime this arm actually is.
    pids = (
        spark.sparkContext.parallelize(range(64), 16)
        .map(lambda _: __import__("os").getpid())
        .distinct()
        .collect()
    )
    info["n_executor_pids"] = len(set(pids))
    info["master"] = spark.sparkContext.master
    for n in names:
        try:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).toPandas()
            out[n][f"{key}_cold"] = round(time.perf_counter() - t0, 3)
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                QUERIES[n](spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            out[n][f"{key}_warm"] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            out[n][f"{key}_err"] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"[{key}] {n}: {out[n]}", file=sys.stderr, flush=True)
    spark.stop()
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scale_data/sf100")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--mem-gb", type=int, default=20)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--local-cpus", type=int, default=32)
    ap.add_argument("--timeout", type=float, default=300.0,
                    help="DuckDB per-query interrupt watchdog (seconds)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-arms", default="",
                    help="comma-separated subset of cluster,local,duck to skip")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    skip = set(filter(None, args.skip_arms.split(",")))

    from delta_unity_duckdb_spark.sources.tables import TABLES
    from delta_unity_duckdb_spark.workload import ORACLE, QUERIES
    from tools.cluster_sim import launch_cluster

    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    out: dict[str, dict] = {n: {} for n in args.names}
    arms_info: dict[str, dict] = {}

    # ---- arm 1: real multi-process standalone cluster ----------------
    if "cluster" not in skip:
        workdir = tempfile.mkdtemp(prefix="bench_cluster_")
        url, procs = launch_cluster(
            args.workers, args.cores, mem_gb=args.mem_gb, workdir=workdir
        )
        try:
            os.environ["SPARK_GRAFT_MASTER"] = url
            os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = f"{args.mem_gb - 2}g"
            arms_info["cluster"] = run_spark_arm(
                args.names, args.sf_dir, args.iters, out, "cluster"
            )
            arms_info["cluster"].update(
                workers=args.workers, cores_per_worker=args.cores,
                mem_gb=args.mem_gb,
            )
        finally:
            os.environ.pop("SPARK_GRAFT_MASTER", None)
            os.environ.pop("SPARK_GRAFT_EXECUTOR_MEM", None)
            for p in procs[::-1]:
                p.terminate()
            for p in procs[::-1]:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.kill()

    # ---- arm 2: single-process local[N] ------------------------------
    if "local" not in skip:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.local_cpus)
        arms_info["local"] = run_spark_arm(
            args.names, args.sf_dir, args.iters, out, "local"
        )

    # ---- arm 3: DuckDB ------------------------------------------------
    if "duck" not in skip:
        import duckdb

        def fresh():
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')"
                )
            return con

        con = fresh()
        for n in args.names:
            sql = ORACLE.get(n)
            if sql is None:
                out[n]["duck_err"] = "no oracle"
                continue
            times: list[float] = []
            for _ in range(args.iters + 1):
                timer = threading.Timer(args.timeout, con.interrupt)
                timer.start()
                try:
                    t0 = time.perf_counter()
                    con.execute(sql).fetchall()
                    times.append(time.perf_counter() - t0)
                except Exception as exc:  # noqa: BLE001
                    out[n]["duck_err"] = f"{type(exc).__name__}: {exc}"[:120]
                    timer.cancel()
                    con = fresh()  # interrupt poisons the connection
                    times = []
                    break
                finally:
                    timer.cancel()
            if times:
                out[n]["duck_cold"] = round(times[0], 3)
                out[n]["duck_warm"] = round(min(times[1:] or times), 3)
            print(f"[duck] {n}: {out[n]}", file=sys.stderr, flush=True)

    for n in args.names:
        d = out[n].get("duck_warm")
        if d:
            for key in ("cluster", "local"):
                w = out[n].get(f"{key}_warm")
                if w is not None:
                    out[n][f"ratio_{key}"] = round(w / max(d, 1e-9), 2)

    payload = {
        "metric": "cluster_scale_bench",
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "iters": args.iters,
        "arms": arms_info,
        "queries": out,
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
