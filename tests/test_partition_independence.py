"""Partition-count independence — the distributed-correctness contract.

At 100 TB the same query runs with 32 shuffle partitions on one cluster
and 2000 on another; results must be bit-identical either way. These
tests re-execute representative queries (exact-DECIMAL aggregation,
windowed EWMA, integer-ppm scores, posting lists) under deliberately
mismatched shuffle-partition settings and assert identical value
multisets — the local mirror of a cluster-size change.
"""

from __future__ import annotations

from collections import Counter

import pytest

from delta_unity_duckdb_spark.workload import QUERIES

CHECKED = [
    "pricing_summary",       # exact DECIMAL sums
    "stats_moments",         # power-sum moments
    "ewma_trailing",         # window lags
    "contamination_check",   # broadcast probe + ppm division
    "inverted_index",        # ranked collect posting lists
    "tfidf_top_terms",       # two-level agg on one key
    "distribution_drift",    # cumulative bucket CDFs
    "equi_depth_histogram",  # NTILE with unique tie-break
    "winsorized_stats",      # percentile bounds + clipped DECIMAL sum
    "dataset_split_assign",  # hash routing must not depend on layout
    "source_mixture_weights",  # sqrt-quantized normalization
    # round-2 sketch/clustering surface: every estimate is exact-integer
    # arithmetic, so layout must never leak into a register, counter,
    # minimum, centroid, or core membership
    "hll_distinct_groups",
    "kmv_set_ops",
    "cms_heavy_hitters",
    "bloom_join_stats",
    "hist_quantile_sketch",
    "kmeans_clusters",
    "cluster_balanced_sample",
    "bigram_surprisal",
    "graph_kcore",
    # round-3: cross-table LSH index join + driver fast paths must not
    # depend on layout either
    "incremental_near_dup_ingest",
    "semantic_dedup_blocks",
    # round-3 batch-assembly + skew ops: hash routing, running-sum
    # packing, and the salted two-phase agg are all layout-sensitive
    # SHAPES whose results must not be
    "sequence_packing",
    "shard_manifest",
    "salted_hot_key_agg",
    "quality_retention_sweep",
    # BPE induction: the merge choice is a global argmax whose tie-break
    # (count DESC, lhs, rhs) and capped word-frequency boundary
    # (cnt DESC, word) must hold under any layout
    "bpe_vocab_merges",
    # round-3b fingerprint/embedding surface: winnowing window-min,
    # span census, per-vector quantization, fixed-point dim stats, the
    # Gram-partial PCA (Arrow batch boundaries shift with layout — the
    # exact integer algebra must not), and the two-arm recall eval
    "winnow_fingerprint_pairs",
    "exact_span_dedup",
    "embedding_quantization",
    "embedding_dim_stats",
    "embedding_centroid_outliers",
    "pca_top_component",
    "ann_recall_eval",
]


def _multiset(df):
    return Counter(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("name", CHECKED)
def test_result_invariant_under_partition_count(spark, sf_dir, name):
    baseline_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        seven = _multiset(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        twentynine = _multiset(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline_parts)
    assert seven == twentynine, f"{name} changed under repartitioning"
