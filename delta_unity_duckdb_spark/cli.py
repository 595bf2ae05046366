"""CLI front-end (reference ``handleCli``, delta-unity-duckdb.js:537-635).

Same surface: ``--table --query --limit --format=table|json --schema``
plus ``--count``. Prints row-count stats before results, like the
reference (js:586). Runs on the engine session (local by default;
spark-submit overrides master on a cluster).

Usage:
    python -m delta_unity_duckdb_spark.cli --table lineitem \
        --query 'SELECT l_returnflag, COUNT(*) AS c FROM $TABLE GROUP BY 1' \
        --format json
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="delta-unity-duckdb-spark",
        description="Query fixture tables / parquet / Delta paths with "
        "$TABLE-templated SQL (reference CLI parity).",
    )
    p.add_argument("--table", default=None, help="table name or path")
    p.add_argument(
        "-i",
        "--interactive",
        action="store_true",
        help="SQL REPL over the fixture tables (query_sync_table.py parity)",
    )
    p.add_argument("--query", default=None, help="SQL with $TABLE placeholder")
    p.add_argument("--limit", type=int, default=10, help="bare-scan limit")
    p.add_argument("--format", choices=("table", "json"), default="table")
    p.add_argument("--schema", action="store_true", help="print schema and exit")
    p.add_argument("--count", action="store_true", help="print row count and exit")
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of executing "
        "(inspect pushdown/pruning/join strategy before paying for the run)",
    )
    p.add_argument("--sf-dir", default=None, help="fixture directory")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from delta_unity_duckdb_spark.scanner import Scanner
    from delta_unity_duckdb_spark.session import get_spark

    spark = get_spark(app_name="duds-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.interactive:
        from delta_unity_duckdb_spark.repl import SQLRepl

        sf_dir = args.sf_dir or "/root/testdata/sf0.1"
        SQLRepl(spark, sf_dir).interactive_mode()
        return 0

    if not args.table:
        build_parser().error("--table is required unless --interactive")
    sc = Scanner(spark, sf_dir=args.sf_dir)

    if args.schema:
        for f in sc.schema(args.table):
            print(f"{f['column_name']}\t{f['column_type']}")
        return 0
    if args.count:
        print(sc.count(args.table))
        return 0

    df = sc.query(args.table, args.query, limit=args.limit)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.format == "json":
        print(sc.to_json(df))
    else:
        print(sc.format_table(sc.to_rows(df)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
