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

# Round-2 driver window (50 slots). Grouped by why each needs verification:
_PRIORITY = [
    # round-1 hash-red (DECIMAL/HUGEINT typing) — now cast per the output
    # convention; must flip to green
    "tumbling_window",
    "sliding_window",
    "session_window",
    "hypertable_rollup",
    "timeseries_gapfill",
    "distribution_drift",
    "lang_profile",
    "source_mixture_weights",
    # round-1 harness errors (array-typed output columns) — now serialized
    "inverted_index",
    "multimodal_features",
    # round-1 rows-only — oracles added this round
    "graph_pagerank",
    "graph_cypher_load",
    "text_profile",
    "near_dup_clusters",
    "minhash_near_dups",
    "simhash_near_dups",
    "embedding_pairs_lsh",
    "similarity_topk_ivf",
    "multimodal_frame_stats",
    # reference-flagship SCD2 + streaming twins (no driver row yet)
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
    # §2-B relational core (driver never reached these in round 1)
    "topk_group_count",
    "projection",
    "count_star",
    "conditional_agg",
    "filter_eq",
    "filter_range_in_like_null",
    "sort_limit",
    "nullsafe_change",
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
    "case_expr",
    "describe_schema",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
