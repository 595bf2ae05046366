#!/usr/bin/env python
"""Matched per-query Spark-vs-DuckDB measurement — the tool behind the
SCALE_BENCH artifacts and per-query gate checks.

Runs the named queries (or the bench headline if none given) on BOTH
engines against the same fixtures under the honest protocol: cold =
first fresh-plan execution, warm = min of N full fresh-plan
re-executions; the DuckDB side gets a per-query interrupt watchdog so a
recursive-CTE blowup can't hang the run. Prints ONE JSON line.

Usage:
  python tools/bench_pair.py [--sf-dir DIR] [--iters N] [--timeout SEC]
                             [name ...]

Engines run sequentially (Spark first, then DuckDB) on the same CPUs —
never measure anything else on the machine at the same time; the
virtualized host's CPU supply swings hour-to-hour, so only same-window
ratios are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--timeout", type=float, default=300.0,
                    help="DuckDB per-query interrupt watchdog (seconds)")
    ap.add_argument("--spark-timeout", type=float, default=0.0,
                    help="Spark per-query (cold+warm combined) watchdog; "
                         "0 = off. A fired watchdog records spark_err="
                         "SPARK_TIMEOUT and the sweep continues — without "
                         "it one quadratic-at-scale query can hang a "
                         "multi-hour sweep invisibly (learned at sf10).")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE
    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.sources.tables import TABLES
    from delta_unity_duckdb_spark.workload import ORACLE, QUERIES
    from delta_unity_duckdb_spark.workload.registry import ORACLE_KIND

    names = args.names or list(HEADLINE)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    out: dict[str, dict] = {n: {} for n in names}

    spark = get_spark(app_name="bench-pair")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["count_star"](spark, args.sf_dir).collect()
    for n in names:
        fired = {"t": False}

        def _cancel():
            fired["t"] = True
            spark.sparkContext.cancelAllJobs()

        timer = (
            threading.Timer(args.spark_timeout, _cancel)
            if args.spark_timeout
            else None
        )
        if timer:
            timer.start()
        try:
            t0 = time.perf_counter()
            QUERIES[n](spark, args.sf_dir).toPandas()
            out[n]["spark_cold"] = round(time.perf_counter() - t0, 3)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                QUERIES[n](spark, args.sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            out[n]["spark_warm"] = round(best, 3)
        except Exception as exc:
            tag = "SPARK_TIMEOUT: " if fired["t"] else ""
            out[n]["spark_err"] = f"{tag}{type(exc).__name__}: {exc}"[:200]
            # A timed-out cold number is not a measurement.
            out[n].pop("spark_cold", None)
        finally:
            if timer:
                timer.cancel()
        print(f"[pair] {n}: {out[n]}", file=sys.stderr, flush=True)
    spark.stop()

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
    for n in names:
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
            except Exception as exc:
                out[n]["duck_err"] = f"{type(exc).__name__}: {exc}"[:120]
                timer.cancel()
                con = fresh()  # interrupt poisons the connection
                # Partial timings from before the failure would feed a
                # bogus "warm" number (and a ratio counted in the matched
                # totals) for a query DuckDB didn't actually finish — an
                # errored/interrupted query contributes no duck numbers.
                times = []
                break
            finally:
                timer.cancel()
        if times:
            out[n]["duck_cold"] = round(times[0], 3)
            out[n]["duck_warm"] = round(min(times[1:] or times), 3)
            if "spark_warm" in out[n]:
                out[n]["ratio"] = round(
                    out[n]["spark_warm"] / max(out[n]["duck_warm"], 1e-9), 2
                )
        print(f"[pair:duck] {n}: {out[n]}", file=sys.stderr, flush=True)

    # Pairing-honesty tag: for these queries the DuckDB side does NOT do
    # equivalent work (e.g. codec queries, where the oracle replays the
    # fixture's closed-form pixel/waveform math because DuckDB has no
    # decoder), so their ratios are artifacts — carry the tag per query
    # and report the matched totals with and without them.
    for n in names:
        if n in ORACLE_KIND:
            out[n]["oracle_kind"] = ORACLE_KIND[n]

    ok = [n for n in names if "ratio" in out[n]]
    payload = {
        "metric": "matched_pair_warm",
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "iters": args.iters,
        "n_matched": len(ok),
        "spark_total_matched": round(sum(out[n]["spark_warm"] for n in ok), 3),
        "duckdb_total_matched": round(sum(out[n]["duck_warm"] for n in ok), 3),
        "queries": out,
    }
    if ok:
        payload["ratio_matched"] = round(
            payload["spark_total_matched"] / max(payload["duckdb_total_matched"], 1e-9), 3
        )
    real = [n for n in ok if n not in ORACLE_KIND]
    if real != ok:
        s = sum(out[n]["spark_warm"] for n in real)
        d = sum(out[n]["duck_warm"] for n in real)
        payload["n_matched_excl_replay"] = len(real)
        payload["ratio_matched_excl_replay"] = round(s / max(d, 1e-9), 3)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
