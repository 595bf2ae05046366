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

# Round-8 driver window (50 slots): slot 1 is the round-8 work —
# `delta_optimize_compaction` (OPTIMIZE small-file bin-packing under
# oracle), never driver-checked. Then the staleness rotation per the
# round-7 plan: the 12 remaining round-3-cohort queries (the
# sketch/window/sampling family that rolled past position 50 last
# round) — after they green, no query's newest driver row is older
# than round 4 — and the round-4 cohort in registry order; its final
# 13 (returned_item_customers, promo_revenue_share through
# nation_revenue_share — single-shape TPC-H variants) roll to round 9.
# `salted_hot_key_agg` and `sequence_packing` — reworked this round
# for the skew-regime findings — get driver rows on the new code.
# Round-10 window: (a) the round-9 rewrites that had NO driver-green row
# on the new code (the r09 verdict's item 2 — graph_triangles/pagerank/
# kcore, the LSH/embedding kernels, simhash lane-packing, descendants),
# (b) everything reworked THIS round (expand pre-aggregation, the IVF
# Arrow kernel, BPE/PCA/CC Arrow local relations, the approx_aggs /
# retention-sweep semantics fixes, and the media fixture path — one
# representative per decode family where all 12 consumers share the
# changed media_df materialization; the full 212-query strict sweep
# still covers the rest locally), then (c) the 21 round-4 single-shape
# TPC-H variants — the stalest rows in the registry, scheduled since the
# r08 verdict.
_PRIORITY = [
    # --- r09 rewrites, driver-unseen on the new code ---
    "graph_triangles",
    "graph_pagerank",
    "graph_kcore",
    "embedding_pairs_lsh",
    "embedding_dedup_cosine",
    "simhash_near_dups",
    "graph_descendants",
    # --- reworked in round 10 ---
    "cube_agg",
    "rollup_agg",
    "grouping_sets",
    "similarity_topk_ivf",
    "ann_recall_eval",
    "bpe_vocab_merges",
    "bpe_encode_stats",
    "pca_top_component",
    "pca_projection_scores",
    "graph_components",
    "approx_aggs",
    "quality_retention_sweep",
    "dedup_signal_agreement",
    # --- media fixture path (media_df/pyarrow staging) consumers ---
    "stream_media_decode",
    "media_ingest_decode",
    "audio_wav_features",
    "audio_energy_segments",
    "image_png_features",
    "image_jpeg_features",
    "image_jpeg_color_features",
    "video_frame_features",
    "multimodal_features",
    # --- last green: round 4 (stalest cohort, registry order) ---
    "customer_order_distribution",
    "disjunctive_band_revenue",
    "forecast_revenue_change",
    "idle_rich_customers",
    "important_part_value",
    "interval_join_events",
    "large_volume_orders",
    "late_shipment_priority",
    "min_cost_supplier",
    "nation_market_share",
    "nation_revenue_share",
    "nation_volume_shipping",
    "order_priority_check",
    "price_outliers",
    "product_profit_by_nation",
    "promo_part_suppliers",
    "promo_revenue_share",
    "returned_item_customers",
    "sole_late_supplier",
    "supplier_count_by_part",
    "top_supplier_revenue",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
