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

# Round-7 driver window (50 slots): slots 1-2 are the round-7 work —
# `dedup_pipeline_exact_first` (the E1+E2 exact-first composition
# promoted from tools/bench_dedup_clique.py arm B) and
# `image_jpeg_color_features` (the new chroma-subsampled color-JPEG
# arm), both never driver-checked. The rest is the pure staleness
# rotation the round-6 plan recorded: the 10 remaining round-2
# re-confirms (window_frame_sum / window_lag_lead rolled past position
# 50 last round, plus the 8 trivial single-operator shapes), then the
# round-3 cohort in registry order — 38 of its 50 fit this window; the
# final 12 (hll_distinct_groups, kmv_distinct_merge, cms_heavy_hitters,
# bloom_join_stats, kmv_set_ops, hll_incremental_refresh,
# hist_quantile_sketch, stream_hll_distinct, stream_cms_top_users,
# window_ntile_stats, window_first_last, stratified_sample) roll to
# round 8, after which no green row is older than round 4.
_PRIORITY = [
    # --- new in round 7, never driver-checked ---
    "dedup_pipeline_exact_first",
    "image_jpeg_color_features",
    # --- last green: round 2 (stalest) ---
    "window_frame_sum",
    "window_lag_lead",
    "projection",
    "count_star",
    "conditional_agg",
    "filter_eq",
    "sort_limit",
    "nullsafe_change",
    "case_expr",
    "describe_schema",
    # --- last green: round 3, registry order ---
    "kmeans_clusters",
    "semantic_dedup_blocks",
    "cluster_balanced_sample",
    "pii_redact",
    "llm_pipeline_end_to_end",
    "graph_kcore",
    "lang_id_confusion",
    "multimodal_features",
    "set_ops",
    "distinct_pairs",
    "string_funcs",
    "regex_funcs",
    "date_funcs",
    "math_funcs",
    "array_funcs",
    "json_extract",
    "cte_subquery",
    "sample_mod",
    "pricing_summary",
    "multiway_join_topk",
    "join_right",
    "join_full",
    "join_cross",
    "grouping_sets",
    "pivot_agg",
    "percentile_agg",
    "exists_subquery",
    "map_funcs",
    "string_agg_group",
    "unpivot_melt",
    "correlated_scalar_agg",
    "delta_time_travel",
    "delta_merge_upsert",
    "table_profile",
    "delta_restore",
    "delta_schema_evolution",
    "lateral_topn_join",
    "window_percent_cume",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
