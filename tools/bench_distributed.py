"""Forced-distributed side benchmark (VERDICT round-3 ask #5).

The adaptive driver tiers (graph.SMALL_GRAPH_EDGES,
clustering.SMALL_KMEANS_ROWS) solve sub-threshold problems on the driver,
so the headline bench at sf0.1 measures the driver arm for
graph_kcore / kmeans_clusters / near_dup_clusters / semantic_dedup_blocks
/ cluster_balanced_sample. This script times BOTH arms in one process —
thresholds at their defaults, then forced to 0 — so the distributed
plans keep a tracked wall-clock, not just plan pins and equivalence
tests. Also re-asserts value-equality of the two arms on the headline
result each run (the same check tests force, but here on the bench SF).

Writes one JSON line:
  {"metric": "forced_distributed_wall", "queries": {name: {"adaptive": s,
   "distributed": s}}, "equal": {...}, "sf": ...}

Usage: python tools/bench_distributed.py [sf_dir] > DISTRIBUTED_BENCH.json
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")

    from delta_unity_duckdb_spark.operators import clustering as C
    from delta_unity_duckdb_spark.operators import graph as G
    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.workload import QUERIES
    from delta_unity_duckdb_spark.workload import curation

    spark = get_spark(app_name="bench-distributed")
    spark.sparkContext.setLogLevel("ERROR")

    names = [
        "graph_kcore",
        "kmeans_clusters",
        "near_dup_clusters",
        "semantic_dedup_blocks",
        "cluster_balanced_sample",
    ]

    def run(name):
        # the fit cache would hide the kmeans arm under test — clear it
        curation._FIT_CACHE.clear()
        df = QUERIES[name](spark, sf_dir).toPandas()  # cold/warm split n/a
        best = float("inf")
        for _ in range(3):
            curation._FIT_CACHE.clear()
            t0 = time.perf_counter()
            out = QUERIES[name](spark, sf_dir).toPandas()
            best = min(best, time.perf_counter() - t0)
        cols = sorted(out.columns)
        canon = out[cols].sort_values(cols).reset_index(drop=True)
        return round(best, 3), canon

    results: dict[str, dict[str, float]] = {}
    equal: dict[str, bool] = {}
    adaptive_out = {}
    for n in names:
        t, canon = run(n)
        results[n] = {"adaptive": t}
        adaptive_out[n] = canon

    g0, k0 = G.SMALL_GRAPH_EDGES, C.SMALL_KMEANS_ROWS
    G.SMALL_GRAPH_EDGES, C.SMALL_KMEANS_ROWS = 0, 0
    try:
        for n in names:
            t, canon = run(n)
            results[n]["distributed"] = t
            equal[n] = bool(
                adaptive_out[n].shape == canon.shape
                and (adaptive_out[n].values == canon.values).all()
            )
    finally:
        G.SMALL_GRAPH_EDGES, C.SMALL_KMEANS_ROWS = g0, k0

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "forced_distributed_wall",
                "unit": "sec",
                "queries": results,
                "equal": equal,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
