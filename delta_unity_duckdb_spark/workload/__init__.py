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

# Round-6 driver window (50 slots): slots 1-2 go to the round-6 work —
# `image_jpeg_features` (new, never driver-checked) and
# `media_ingest_decode` (oracle shape changed this round); the rest is a
# pure staleness rotation — the 13 queries whose only green row is
# round 1 (5 windows old), then 35 of the 45 whose last green is round 2
# (the final two listed entries now sit past position 50 and roll to
# round 7).
# The remaining round-2 re-confirms (projection, count_star,
# conditional_agg, filter_eq, sort_limit, nullsafe_change, case_expr,
# describe_schema — all trivial single-operator shapes) rotate in
# round 7 together with the round-3 cohort.
_PRIORITY = [
    # --- new in round 6, never driver-checked: the real-JPEG arm ---
    "image_jpeg_features",
    # --- oracle shape changed in round 6 (2-row -> 3-codec rollup):
    # its r05 green row describes the old contract, so re-earn one ---
    "media_ingest_decode",
    # --- last green: round 1 (stalest) ---
    "ewma_trailing",
    "equi_depth_histogram",
    "graph_one_hop",
    "graph_descendants",
    "graph_degree_distribution",
    "wordcount",
    "token_counts",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "bigram_freq",
    "doc_repetition",
    "doc_chunks",
    "dataset_split_assign",
    # --- last green: round 2 ---
    "sliding_window",
    "distribution_drift",
    "graph_cypher_load",
    "graph_pagerank",
    "lang_profile",
    "text_profile",
    "minhash_near_dups",
    "simhash_near_dups",
    "embedding_pairs_lsh",
    "similarity_topk_ivf",
    "near_dup_clusters",
    "inverted_index",
    "source_mixture_weights",
    "multimodal_frame_stats",
    "scd2_sync",
    "snapshot_diff_orders",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_stateful_totals",
    "stream_sliding_window",
    "stream_stream_join",
    "stream_dedup",
    "stream_scd2_sync",
    "stream_static_join",
    "topk_group_count",
    "filter_range_in_like_null",
    "group_aggs",
    "rollup_agg",
    "cube_agg",
    "join_inner",
    "join_left",
    "join_semi",
    "join_anti",
    "self_join",
    "window_rank",
    "window_frame_sum",
    "window_lag_lead",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
