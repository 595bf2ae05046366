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


def test_compact_table_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from delta_unity_duckdb_spark.sources.sinks import compact_table

    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_small_files")
    o.repartition(40).write.parquet(out)  # simulate streaming small files

    before = o.count()
    stats = compact_table(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40

    back = spark.read.parquet(out)
    assert back.count() == before
    assert sorted(back.columns) == sorted(o.columns)


def test_compact_sorted_tightens_minmax(spark, sf_dir, tmp_path):
    """Sorting within compaction clusters keys, so per-file min/max ranges
    shrink — the stat that drives parquet row-group / file skipping."""
    import pyarrow.parquet as pq
    import glob

    from delta_unity_duckdb_spark.sources.sinks import compact_table

    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_sorted_compact")
    o.repartition(8).write.parquet(out)

    total = sum(
        os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    # target ⇒ exactly ~4 output files regardless of fixture scale
    compact_table(spark, out, target_file_bytes=max(1, total // 4), sort_within_by=["o_orderkey"])
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 2
    spans = []
    for f in files:
        t = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"]
        spans.append((min(t.to_pylist()), max(t.to_pylist())))
    spans.sort()
    # ranges are (near-)disjoint after range-partitioned sort
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
