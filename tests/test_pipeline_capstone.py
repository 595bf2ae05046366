"""End-to-end curation pipeline invariants (llm_pipeline_end_to_end):
stage-level effects that the value-hash oracle can't articulate when it
fails — dedup actually removes the planted re-crawl copies, the output is
partition-independent, and the mix sheet accounts for every surviving
token."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.workload.curation import llm_pipeline_end_to_end
from delta_unity_duckdb_spark.sources.tables import load_table


def test_pipeline_removes_planted_recrawl_copies(spark, sf_dir):
    """Every 20th doc is planted twice (original id and id+100000 with
    identical text). After redaction the copies are byte-identical again,
    so exact dedup must keep only the smaller id: total kept docs is
    bounded by the number of DISTINCT texts that pass the quality gate."""
    out = llm_pipeline_end_to_end(spark, sf_dir)
    total_docs = out.agg(F.sum("n_docs")).collect()[0][0]
    n_base = load_table(spark, sf_dir, "documents").count()
    assert 0 < total_docs <= n_base  # copies are gone (<= base corpus)


def test_pipeline_partition_independent(spark, sf_dir):
    a = [tuple(r) for r in llm_pipeline_end_to_end(spark, sf_dir).collect()]
    shuffled = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = [tuple(r) for r in llm_pipeline_end_to_end(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuffled)
    assert a == b


def test_pipeline_splits_cover_expected_shares(spark, sf_dir):
    """The Knuth-hash router should land roughly 80/10/10 over surviving
    docs (loose band — small corpus)."""
    rows = llm_pipeline_end_to_end(spark, sf_dir).collect()
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = sum(by_split.values())
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split.get("train", 0) / total > 0.6
