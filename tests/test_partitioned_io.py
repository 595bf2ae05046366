"""Partitioned writes with partition pruning, and binary-file ingest.

Partition pruning is the 100 TB lever the reference gets from Delta/DuckDB
file skipping (SURVEY.md §4): a filter on the partition column must prune
directories at planning time (PartitionFilters in the scan), not read and
discard rows.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.sources.sinks import write_table
from delta_unity_duckdb_spark.sources.tables import load_table, read_any


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_priority")
    write_table(o, out, partition_by=["o_orderpriority"])

    # hive-style partition directories exist
    parts = [d for d in os.listdir(out) if d.startswith("o_orderpriority=")]
    assert len(parts) == 5

    back = spark.read.parquet(out)
    urgent = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = urgent._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters")[1].split("]")[0]

    expected = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert urgent.count() == expected


def test_partitioned_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_rt")
    write_table(o, out, partition_by=["o_orderpriority"])
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # partition column survives the roundtrip (moved into directory keys)
    assert sorted(back.columns) == sorted(o.columns)


def test_binary_file_ingest(spark, tmp_path):
    blobs = {"a.bin": b"\x00\x01\x02PNG-ish", "b.bin": b"frame" * 10}
    for fname, payload in blobs.items():
        (tmp_path / fname).write_bytes(payload)

    df = read_any(spark, str(tmp_path), fmt="binaryFile")
    assert {f.name for f in df.schema.fields} == {
        "path",
        "modificationTime",
        "length",
        "content",
    }
    rows = {os.path.basename(r.path): bytes(r.content) for r in df.collect()}
    assert rows == blobs
