"""Interactive SQL REPL (reference query_sync_table.py:102-209 parity).

Same surface as the reference's PostgreSQL executor, over ``spark.sql``:
- ``execute_query``: SELECT/``WITH`` queries return formatted results
  (aligned text table or JSON, query_sync_table.py:131-173); DML returns
  an affected-rowcount report (:122-125).
- auto table-name qualification: bare fixture table names resolve via
  pre-registered temp views (the reference's schema-prefix rewrite,
  :106-107, becomes view registration — Spark's catalog does the rest).
- ``interactive_mode``: prompt loop with ``exit``/``help``/``tables``
  commands (:175-209).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession

from delta_unity_duckdb_spark.scanner import Scanner
from delta_unity_duckdb_spark.sources.tables import register_views

HELP = """Commands:
  exit | quit          leave the REPL
  help                 this message
  tables               list available tables
  format table|json    switch output format
Any other input is executed as Spark SQL against the registered tables."""


class SQLRepl:
    def __init__(self, spark: SparkSession, sf_dir: str, fmt: str = "table"):
        self.spark = spark
        self.sf_dir = sf_dir
        self.fmt = fmt
        register_views(spark, sf_dir)

    def execute_query(self, sql: str) -> dict[str, Any]:
        """Run one statement; classify SELECT-like vs DML like the
        reference's branch (query_sync_table.py:113-125)."""
        head = sql.lstrip().split(None, 1)
        verb = head[0].upper() if head else ""
        df = self.spark.sql(sql)
        if verb in ("SELECT", "WITH", "SHOW", "DESCRIBE", "EXPLAIN", "VALUES"):
            rows = Scanner.to_rows(df)
            return {"kind": "rows", "rows": rows, "columns": df.columns}
        # DML/DDL: Spark returns an empty or metrics DataFrame; report
        # affected rows when the command surface provides them.
        rows = Scanner.to_rows(df)
        n = rows[0].get("num_affected_rows") if rows and "num_affected_rows" in rows[0] else len(rows)
        return {"kind": "dml", "rowcount": n}

    def render(self, result: dict[str, Any]) -> str:
        if result["kind"] == "dml":
            return f"OK ({result['rowcount']} rows affected)"
        if self.fmt == "json":
            return json.dumps(
                Scanner.serialize_big_int(result["rows"]), indent=2, default=str
            )
        return Scanner.format_table(result["rows"])

    def handle(self, line: str) -> str | None:
        """One REPL interaction; returns output text or None on exit."""
        cmd = line.strip()
        if not cmd:
            return ""
        low = cmd.lower()
        if low in ("exit", "quit"):
            return None
        if low == "help":
            return HELP
        if low == "tables":
            names = [
                t.name for t in self.spark.catalog.listTables() if t.isTemporary
            ]
            return "\n".join(sorted(names))
        if low.startswith("format "):
            fmt = low.split()[1]
            if fmt in ("table", "json"):
                self.fmt = fmt
                return f"output format: {fmt}"
            return "usage: format table|json"
        try:
            return self.render(self.execute_query(cmd))
        except Exception as exc:  # surface, don't crash the loop (ref :127-129)
            return f"Error: {exc}"

    def interactive_mode(self) -> None:  # pragma: no cover - needs a tty
        print("Spark SQL REPL — 'help' for commands.")
        while True:
            try:
                line = input("sql> ")
            except (EOFError, KeyboardInterrupt):
                break
            out = self.handle(line)
            if out is None:
                break
            if out:
                print(out)
