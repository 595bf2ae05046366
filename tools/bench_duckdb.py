#!/usr/bin/env python
"""DuckDB side of the bench gate: run the headline queries' oracle SQL at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print one JSON line in the same
shape as bench.py, so the two engines can be compared at identical scale.

BASELINE.md: the PySpark engine must stay within 2x of this wall-clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from delta_unity_duckdb_spark.sources.tables import TABLES
from delta_unity_duckdb_spark.workload import ORACLE


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        sql = ORACLE.get(name)
        if sql is None:
            skipped.append(name)
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        cold[name] = round(time.perf_counter() - t0, 3)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "cold_total": round(sum(cold.values()), 3),
                "skipped_no_oracle": skipped,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
