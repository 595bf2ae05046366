"""Workload registry — importing the submodules populates QUERIES/ORACLE.

The per-round driver correctness-checks the FIRST 50 entries of ``queries()``
(dict insertion order). ``_PRIORITY`` pins that window to the queries that
most need a driver-green row this round: the round-1 hash-red typed outputs,
the newly-oracled formerly rows-only operators, the SCD2 + streaming
flagships, and the §2-B relational core. Everything else keeps module order
after the window; rotate the list as rows turn green so every registered
query eventually earns a driver-verified row.
"""

from delta_unity_duckdb_spark.workload import (  # noqa: F401
    curation,
    events,
    graphq,
    llm,
    media,
    relational,
    scd,
    sketches,
    streamq,
    tpch_shapes,
)
from delta_unity_duckdb_spark.workload.registry import ORACLE, QUERIES

# Round-3 driver window (50 slots): every slot goes to a query that has
# NEVER earned a driver-green row (r01+r02 greens stay valid; all of these
# are local-strict green under tools/strict_check.py).
#
# ROUND-4 ROTATION (assuming this window goes green): 49 never-checked
# queries remain — exactly one more full window. Fill _PRIORITY with:
#   round-3 additions: incremental_near_dup_ingest stream_incremental_dedup
#     sequence_packing shard_manifest dedup_signal_agreement
#     boilerplate_ngram_flags quality_retention_sweep salted_hot_key_agg
#     key_skew_profile bpe_vocab_merges bpe_encode_stats curation_verdicts
#     winnow_fingerprint_pairs exact_span_dedup embedding_quantization
#     embedding_dim_stats embedding_centroid_outliers pca_top_component
#     ann_recall_eval stream_late_data_drop pca_projection_scores
#   stragglers: bigram_surprisal interval_join_events stats_moments
#     winsorized_stats incremental_agg_refresh cohort_retention
#     basket_pairs skyline_pareto regional_revenue price_outliers
#     bitwise_aggs series_generate topn_per_group mode_agg string_distance
#     calendar_breakdown window_range_frame window_distinct_count
#     histogram_bins regr_aggs approx_aggs(rows-only by design)
#   TPC-H shapes: order_priority_check customer_order_distribution
#     top_supplier_revenue large_volume_orders idle_rich_customers
#     nation_volume_shipping forecast_revenue_change
#     returned_item_customers promo_revenue_share disjunctive_band_revenue
#     sole_late_supplier nation_market_share min_cost_supplier
#     late_shipment_priority product_profit_by_nation important_part_value
#     supplier_count_by_part promo_part_suppliers nation_revenue_share
_PRIORITY = [
    # §2-C full-SQL function classes — zero driver rows so far
    "set_ops",
    "distinct_pairs",
    "string_funcs",
    "regex_funcs",
    "date_funcs",
    "math_funcs",
    "array_funcs",
    "map_funcs",
    "json_extract",
    "cte_subquery",
    "exists_subquery",
    "correlated_scalar_agg",
    "sample_mod",
    "stratified_sample",
    "join_right",
    "join_full",
    "join_cross",
    "grouping_sets",
    "pivot_agg",
    "percentile_agg",
    "string_agg_group",
    "unpivot_melt",
    "window_ntile_stats",
    "window_first_last",
    # A1 Delta-log parity evidence (reference delta-unity-duckdb.js:330)
    "delta_time_travel",
    "delta_merge_upsert",
    "delta_restore",
    "delta_schema_evolution",
    # round-2/3 flagships
    "llm_pipeline_end_to_end",
    "graph_kcore",
    "kmeans_clusters",
    "semantic_dedup_blocks",
    "cluster_balanced_sample",
    "pii_redact",
    "lateral_topn_join",
    "window_percent_cume",
    "lang_id_confusion",
    "multimodal_features",  # gained a value-level oracle this round
    # TPC-H headliners
    "pricing_summary",
    "multiway_join_topk",
    "table_profile",
    # sketch family (batch + streaming twins)
    "hll_distinct_groups",
    "kmv_distinct_merge",
    "cms_heavy_hitters",
    "bloom_join_stats",
    "kmv_set_ops",
    "hll_incremental_refresh",
    "hist_quantile_sketch",
    "stream_hll_distinct",
    "stream_cms_top_users",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
