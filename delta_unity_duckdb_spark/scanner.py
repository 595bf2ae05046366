"""Scanner — the engine's query front-end (reference parity pillar 1).

Mirrors the reference ``DeltaScanner`` class (delta-unity-duckdb.js:56-522)
re-expressed Spark-first:

- ``query(table, sql=None, limit=10)``: no SQL → bare scan with a default
  LIMIT (js:327-330); with SQL → **global** ``$TABLE`` substitution so
  self-joins / repeated references hit the same scan (js:331-335, the
  ``/\\$TABLE/g`` regex → SURVEY.md B14). Substitution targets a temp view
  over the loaded table, so Catalyst sees one named relation and applies
  predicate pushdown / column pruning into the file scan.
- ``count(table)``: row-count stats (js:355-449) → ``df.count()``; no
  BigInt coercion hacks needed on the JVM (js:433-443).
- ``schema(table)``: LIMIT-0-view + DESCRIBE trick (js:456-509) becomes a
  free metadata read — ``df.schema`` touches only the parquet footer /
  Delta log, never data.
- ``to_rows`` / ``to_json``: the row-object edge (js:340, 528-532). Large
  int64 values are JSON-safe as native Python ints; ``serialize_big_int``
  reproduces the reference's >2^53 → string behavior for JS consumers.

The reference serializes queries through a FIFO queue to dodge DuckDB-node
concurrency bugs (README.md:230-349); Spark schedules concurrent jobs
natively, so one shared SparkSession replaces the queue (SURVEY.md A14).

Scale posture: nothing here materializes data except the explicit
``to_rows``/``to_json`` display edges; ``query`` returns a lazy DataFrame.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from delta_unity_duckdb_spark.sources.tables import TABLES, load_table

_TABLE_RE = re.compile(r"\$TABLE\b")
_JS_SAFE_INT = 1 << 53


class Scanner:
    """Query a fixture table or an arbitrary parquet/Delta path with
    optional ``$TABLE``-templated SQL (reference CLI semantics)."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        self._view_n = 0

    # -- resolution ------------------------------------------------------
    def load(self, table: str) -> DataFrame:
        """Resolve a table reference: fixture name, catalog name, or path.

        The reference distinguishes 3-part Unity Catalog names from raw
        abfss/s3/local paths (delta-unity-duckdb.js:264-271); here: known
        fixture name → sf_dir parquet; dotted name → ``spark.table`` (a
        configured metastore resolves it); else treat as a filesystem path.
        """
        if table in TABLES:
            return load_table(self.spark, self.sf_dir, table)
        if re.fullmatch(r"\w+(\.\w+){1,2}", table) and not os.path.exists(table):
            return self.spark.table(table)
        from delta_unity_duckdb_spark.sources.tables import read_any

        return read_any(self.spark, table)

    # -- query -----------------------------------------------------------
    def query(
        self, table: str, sql: str | None = None, limit: int = 10
    ) -> DataFrame:
        """Default bare scan w/ LIMIT (js:327-330) or $TABLE-substituted
        SQL (js:331-335). All ``$TABLE`` occurrences resolve to the same
        view, preserving self-join semantics."""
        df = self.load(table)
        if sql is None:
            return df.limit(limit)
        self._view_n += 1
        view = f"__scanner_tbl_{self._view_n}"
        df.createOrReplaceTempView(view)
        return self.spark.sql(_TABLE_RE.sub(view, sql))

    def count(self, table: str) -> int:
        """Row-count stats (js:425): metadata-only for parquet footers."""
        return self.load(table).count()

    def schema(self, table: str) -> list[dict[str, str]]:
        """Schema introspection (js:496-509) — no data read."""
        return [
            {"column_name": f.name, "column_type": f.dataType.simpleString()}
            for f in self.load(table).schema.fields
        ]

    # -- display / serialization edges ----------------------------------
    @staticmethod
    def to_rows(df: DataFrame) -> list[dict[str, Any]]:
        """Row-object list (js:340). The ONLY materializing edge."""
        return [r.asDict(recursive=True) for r in df.collect()]

    @classmethod
    def to_json(cls, df: DataFrame, indent: int = 2) -> str:
        """Pretty JSON output (js:612-617) with JS-safe int handling."""
        return json.dumps(
            cls.serialize_big_int(cls.to_rows(df)), indent=indent, default=str
        )

    @staticmethod
    def serialize_big_int(data: Any) -> Any:
        """Reference BigInt→string edge (js:528-532): ints beyond JS
        Number.MAX_SAFE_INTEGER become strings, only at this boundary."""
        if isinstance(data, dict):
            return {k: Scanner.serialize_big_int(v) for k, v in data.items()}
        if isinstance(data, list):
            return [Scanner.serialize_big_int(v) for v in data]
        if isinstance(data, int) and not isinstance(data, bool) and abs(data) >= _JS_SAFE_INT:
            return str(data)
        return data

    @staticmethod
    def format_table(rows: list[dict[str, Any]]) -> str:
        """Aligned text table (query_sync_table.py:131-158 parity):
        width-computed columns, header rule, NULL rendering."""
        if not rows:
            return "(no rows)"
        cols = list(rows[0].keys())
        cells = [
            ["NULL" if r[c] is None else str(r[c]) for c in cols] for r in rows
        ]
        widths = [
            max(len(cols[i]), *(len(row[i]) for row in cells))
            for i in range(len(cols))
        ]
        line = " | ".join(c.ljust(w) for c, w in zip(cols, widths))
        rule = "-+-".join("-" * w for w in widths)
        body = "\n".join(
            " | ".join(v.ljust(w) for v, w in zip(row, widths)) for row in cells
        )
        return f"{line}\n{rule}\n{body}"
