"""Catalog & introspection (reference A9-A10, A30-A31; SURVEY.md §7.4).

- ``list_tables``: information_schema-style listing
  (query_sync_table.py:37-43) → ``spark.catalog.listTables`` plus the
  fixture directory contents, ordered by name.
- ``describe``: column introspection ordered by position
  (test_pg_query.py:72-78) → DataFrame schema fields.
- ``table_stats``: row-count stats (delta-unity-duckdb.js:355-449).

All metadata paths: none of these scan data except ``table_stats`` (a
count aggregate that parquet answers from footer row-group stats).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from delta_unity_duckdb_spark.sources.tables import load_table


def list_tables(spark: SparkSession, sf_dir: str) -> list[dict[str, str]]:
    """Fixture-dir tables + any catalog temp views, ordered by name
    (ORDER BY table_name parity, query_sync_table.py:41)."""
    out: list[dict[str, str]] = []
    if os.path.isdir(sf_dir):
        for entry in os.listdir(sf_dir):
            if entry.endswith(".parquet"):
                out.append(
                    {"table_name": entry[: -len(".parquet")], "table_type": "BASE TABLE"}
                )
            elif os.path.isdir(
                os.path.join(sf_dir, entry, "_delta_log")
            ):
                out.append({"table_name": entry, "table_type": "BASE TABLE"})
    for t in spark.catalog.listTables():
        if t.isTemporary:
            out.append({"table_name": t.name, "table_type": "VIEW"})
    return sorted(out, key=lambda d: d["table_name"])


def describe(
    spark: SparkSession, sf_dir: str, table: str
) -> list[dict[str, object]]:
    """Ordinal-ordered column metadata (test_pg_query.py:72-78 parity)."""
    df = load_table(spark, sf_dir, table)
    return [
        {
            "column_name": f.name,
            "data_type": f.dataType.simpleString(),
            "is_nullable": f.nullable,
            "ordinal_position": i + 1,
        }
        for i, f in enumerate(df.schema.fields)
    ]


def table_stats(spark: SparkSession, sf_dir: str, table: str) -> dict[str, int]:
    """Row-count stats object ({count}, delta-unity-duckdb.js:446)."""
    return {"count": load_table(spark, sf_dir, table).count()}
