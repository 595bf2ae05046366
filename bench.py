#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock over the headline set (lower is better). Each
query executes fully (collect) so the measurement includes the whole plan,
not just lazy construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "topk_group_count",
    "pricing_summary",
    "multiway_join_topk",
    "group_aggs",
    "window_rank",
    "join_inner",
    "self_join",
    "dedup_exact",
    "wordcount",
    "similarity_topk",
    "tumbling_window",
    "session_window",
    "scd2_sync",
    "graph_one_hop",
    "cte_subquery",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.workload import QUERIES

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once with a trivial action.
    QUERIES["count_star"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
