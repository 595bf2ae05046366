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

# Round-5 driver window (50 slots): the FINAL 27 never-driver-green queries
# (the 11 relational stragglers queued since round 2/3 plus the 16 round-4
# retrieval / mixture / multimodal additions — all strict-green at sf0.001
# AND sf0.01 under tools/strict_check.py), the new round-5
# media_ingest_decode, then 22 re-confirmation slots for the oldest
# (round-1) greens so no green row is more than a few rounds stale. A green
# window here closes ever-driver-green to 208/208.
_PRIORITY = [
    # --- the 27 never-driver-green queries ---
    # relational stragglers (§2-C shapes, strict-green since r02/r03)
    "stats_moments",
    "bitwise_aggs",
    "series_generate",
    "topn_per_group",
    "mode_agg",
    "string_distance",
    "calendar_breakdown",
    "window_range_frame",
    "histogram_bins",
    "window_distinct_count",
    "regr_aggs",
    # round-4 retrieval / fusion / mixture / text family
    "bm25_topk",
    "hybrid_rrf_fusion",
    "training_order_shuffle",
    "dup_ngram_char_share",
    "leakage_safe_split",
    "token_budget_mixture",
    "markup_text_extract",
    "context_length_sweep",
    # round-4 real-codec multimodal arms + streaming twin
    "audio_wav_features",
    "image_png_features",
    "image_resize_stats",
    "video_frame_features",
    "image_pixel_dedup",
    "image_dhash_near_dup",
    "audio_energy_segments",
    "stream_media_decode",
    # round-5 addition: on-disk binaryFile ingest → decode, never checked
    "media_ingest_decode",
    # --- 22 re-confirmation slots: round-1 greens, now 4 windows old ---
    "scan_limit",
    "graph_counts",
    "dedup_exact",
    "user_jaccard_pairs",
    "similarity_topk",
    "ngram_jaccard",
    "embedding_dedup_cosine",
    "knn_join",
    "corpus_curation",
    "tfidf_top_terms",
    "lang_id",
    "quality_scores",
    "token_counts_bpe",
    "asof_join_events",
    "tumbling_window",
    "session_window",
    "event_funnel",
    "hypertable_rollup",
    "timeseries_gapfill",
    "graph_components",
    "graph_triangles",
    "contamination_check",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
