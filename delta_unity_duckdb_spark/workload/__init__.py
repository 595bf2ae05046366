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
    retrieval,
    scd,
    sketches,
    streamq,
    tpch_shapes,
)
from delta_unity_duckdb_spark.workload.registry import ORACLE, QUERIES

# Round-4 driver window (50 slots): every slot goes to a query that has
# NEVER earned a driver-green row (r01–r03 greens stay valid; all of these
# are local-strict green under tools/strict_check.py).
#
# ROUND-5 ROTATION (assuming this window goes green): 27 never-checked
# queries remain — a final top-up window. Fill _PRIORITY with:
#   stats_moments bitwise_aggs series_generate topn_per_group mode_agg
#   string_distance calendar_breakdown window_range_frame histogram_bins
#   window_distinct_count regr_aggs
# (simple §2-C relational shapes, strict-green since round 2/3) plus the
# round-4 additions, all strict-green at sf0.001 AND sf0.01:
#   bm25_topk training_order_shuffle dup_ngram_char_share
#   hybrid_rrf_fusion leakage_safe_split token_budget_mixture
#   markup_text_extract context_length_sweep audio_wav_features
#   image_png_features image_resize_stats video_frame_features
#   image_pixel_dedup image_dhash_near_dup audio_energy_segments
#   stream_media_decode
_PRIORITY = [
    # round-3 LLM-pipeline flagships — PCA / BPE / winnowing / exact-span
    "pca_top_component",
    "pca_projection_scores",
    "bpe_vocab_merges",
    "bpe_encode_stats",
    "winnow_fingerprint_pairs",
    "exact_span_dedup",
    "ann_recall_eval",
    "incremental_near_dup_ingest",
    "dedup_signal_agreement",
    "sequence_packing",
    "shard_manifest",
    "boilerplate_ngram_flags",
    "quality_retention_sweep",
    "curation_verdicts",
    "embedding_quantization",
    "embedding_dim_stats",
    "embedding_centroid_outliers",
    "salted_hot_key_agg",
    "key_skew_profile",
    # streaming twins of the round-3 additions
    "stream_incremental_dedup",
    "stream_late_data_drop",
    # remaining TPC-H shapes (tpch_shapes.py)
    "order_priority_check",
    "customer_order_distribution",
    "top_supplier_revenue",
    "large_volume_orders",
    "idle_rich_customers",
    "nation_volume_shipping",
    "forecast_revenue_change",
    "returned_item_customers",
    "promo_revenue_share",
    "disjunctive_band_revenue",
    "sole_late_supplier",
    "nation_market_share",
    "min_cost_supplier",
    "late_shipment_priority",
    "product_profit_by_nation",
    "important_part_value",
    "supplier_count_by_part",
    "promo_part_suppliers",
    "nation_revenue_share",
    # stragglers
    "approx_aggs",
    "regional_revenue",
    "cohort_retention",
    "basket_pairs",
    "skyline_pareto",
    "incremental_agg_refresh",
    "winsorized_stats",
    "bigram_surprisal",
    "interval_join_events",
    "price_outliers",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
