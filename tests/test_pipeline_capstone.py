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


def test_curation_verdicts_every_reason_and_precedence(spark, tmp_path):
    """Synthetic corpus hitting every verdict arm, pinning precedence:
    gates beat dedup (a too-short exact copy reads 'too_short', not
    'exact_dup'), exact beats near."""
    import os

    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.workload.curation import curation_verdicts

    base = " ".join(f"w{i}" for i in range(30))          # 30 tokens, passes gates
    near = " ".join(f"w{i}" for i in range(29)) + " zz"  # near-dup of base
    rows = [
        (0, base),                                # kept (canonical of exact pair)
        (1, base),                                # exact_dup of 0
        (2, near),                                # near_dup family of 0
        (3, "short doc"),                         # too_short
        (4, " ".join(f"u{i}" for i in range(250))),   # too_long
        (5, " ".join(["rep"] * 25 + [f"x{i}" for i in range(10)])),  # repetitive
        (6, "tiny " + base),                      # short? 31 tokens -> near dup of base family
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    got = {r["doc_id"]: r["reason"] for r in curation_verdicts(spark, sf).collect()}
    assert got[0] == "kept"
    assert got[1] == "exact_dup"
    assert got[2] == "near_dup"
    assert got[3] == "too_short"
    assert got[4] == "too_long"
    assert got[5] == "repetitive"
    kept = {k for k, v in got.items() if v == "kept"}
    assert 0 in kept and 1 not in kept
