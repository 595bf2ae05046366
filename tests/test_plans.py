"""Physical-plan shape assertions — the 100 TB design contract.

Correct results are necessary but not sufficient: these tests pin the plan
properties that decide whether a query survives a 1000-executor scale-up —
predicate pushdown into the parquet scan, column pruning, broadcast joins
for dimension tables, TakeOrdered for top-k (no global sort), and no
accidental cartesian products."""

from __future__ import annotations

import pytest

from delta_unity_duckdb_spark.workload import QUERIES


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {name: plan_of(QUERIES[name](spark, sf_dir)) for name in QUERIES}


def test_filter_pushdown_reaches_scan(plans):
    p = plans["filter_eq"]
    assert "PushedFilters: [" in p
    assert "IsNotNull" in p or "EqualTo" in p


def test_range_in_like_filters_pushed(plans):
    p = plans["filter_range_in_like_null"]
    assert "PushedFilters: [" in p
    assert "GreaterThanOrEqual(p_size,10)" in p


def test_column_pruning_projection(plans):
    """A 3-column projection must not read the whole 16-column lineitem."""
    p = plans["projection"]
    read = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in read and "l_shipdate" not in read


def test_dim_join_broadcasts(plans):
    assert "BroadcastHashJoin" in plans["join_inner"]
    assert "BroadcastHashJoin" in plans["multiway_join_topk"]


def test_topk_uses_take_ordered(plans):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject — a per-partition
    top-k + driver merge, not a global sort."""
    assert "TakeOrderedAndProject" in plans["topk_group_count"]
    assert "TakeOrderedAndProject" in plans["multiway_join_topk"]


def test_partial_aggregation_before_shuffle(plans):
    """Group-bys must partial-aggregate map-side (two HashAggregate levels)."""
    p = plans["pricing_summary"]
    assert p.count("HashAggregate") >= 2
    assert "partial_" in p


def test_no_cartesian_products_anywhere(spark, sf_dir, plans):
    """The only sanctioned cross joins are broadcast-nested-loop with a
    tiny side (join_cross region×nation, similarity query-vector
    broadcast). A CartesianProduct operator anywhere is a scale bug."""
    offenders = {
        name: p for name, p in plans.items() if "CartesianProduct" in p
    }
    assert not offenders, f"cartesian products in: {sorted(offenders)}"


def test_semi_anti_joins_planned_as_joins(plans):
    assert "LeftSemi" in plans["join_semi"]
    assert "LeftAnti" in plans["join_anti"]


def test_exists_subquery_decorrelates(plans):
    """EXISTS/NOT EXISTS must decorrelate to semi/anti joins — a correlated
    re-execution per row would be O(n²) at scale."""
    p = plans["exists_subquery"]
    assert "LeftSemi" in p and "LeftAnti" in p


def test_scan_limit_short_circuits(plans):
    """Deterministic ordered limit → per-partition top-k merge (no global
    sort, no full materialization)."""
    assert "TakeOrderedAndProject" in plans["scan_limit"]


def test_q5_chain_broadcasts_dims(plans):
    """The region→nation→customer dim chain must broadcast; the only
    shuffle join is the fact⋈fact orders⋈lineitem."""
    p = plans["regional_revenue"]
    assert p.count("BroadcastHashJoin") >= 2


def test_asof_join_is_single_shuffle_no_range_join(plans):
    """The as-of join must plan as union -> one hash Exchange on the key ->
    window, never a (broadcast) nested-loop range join."""
    p = plans["asof_join_events"]
    assert "Exchange hashpartitioning(user_id" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "Window" in p
    # both union branches push their event_type filter into the scan
    assert p.count("EqualTo(event_type,") == 2


def test_hypertable_rollup_fine_grain_no_expand(plans, spark, sf_dir):
    """Round-8 shape: NO Expand — a ROLLUP's Expand quadruples the raw
    rows before the partial aggregate (measured 10.2 s at sf100). The
    raw scan feeds exactly ONE fine-grain aggregate (5-minute buckets),
    checkpointed; the day/hour levels re-aggregate that tiny frame and
    union (3 branches reading the checkpoint's LogicalRDD — zero
    FileScans in the registered plan, so one fact-table pass by
    construction). The scan half (pruning + map-side combine) is pinned
    on the inline-built fine aggregate."""
    p = plans["hypertable_rollup"]
    assert "Expand" not in p
    assert "Union" in p
    assert "FileScan parquet" not in p  # all levels read the checkpoint
    # the pre-checkpoint scan: pruned columns + partial aggregation
    from delta_unity_duckdb_spark.functions.numeric import fx_sums
    from delta_unity_duckdb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    fine = fx_sums(
        e.select(
            F.window("ts", "5 minutes")["start"].alias("bucket_5m"), "value"
        ),
        ["bucket_5m"],
        {"sv": (F.expr("CAST(value * 10000 + 0.5d AS BIGINT)"), 4)},
        extras={"n": F.count(F.lit(1))},
    )
    fp = plan_of(fine)
    assert "partial_count" in fp or "partial_sum" in fp  # map-side combine
    read = fp.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "ts" in read and "value" in read
    assert "props" not in read and "user_id" not in read


def test_unpivot_is_expand_no_shuffle(plans):
    """UNPIVOT must plan as Expand directly over the pruned scan — melting
    is row-local, so any Exchange here would be a scale bug."""
    p = plans["unpivot_melt"]
    assert "Expand" in p
    assert "Exchange" not in p


def test_gapfill_broadcasts_spine_bounds(plans):
    """The gap-fill spine derives from a 1-row bounds aggregate — it must
    broadcast; the raw-event shuffle is the only data-proportional one."""
    p = plans["timeseries_gapfill"]
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_q4_exists_plans_as_semi_join(plans):
    p = plans["order_priority_check"]
    assert "LeftSemi" in p


def test_q18_having_side_broadcasts(plans):
    # the HAVING-filtered aggregate must broadcast into orders, leaving
    # groupBy(l_orderkey) as the only fact shuffle
    p = plans["large_volume_orders"]
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_q7_dims_broadcast_single_fact_shuffle(plans):
    p = plans["nation_volume_shipping"]
    assert p.count("BroadcastHashJoin") >= 3  # supplier, customer, 2×nation folded
    assert "CartesianProduct" not in p


def test_topn_per_group_single_window_shuffle(plans):
    p = plans["topn_per_group"]
    assert "Window" in p
    # rank filter applies right after the window — no second shuffle
    assert p.count("Exchange") <= 1


def test_knn_join_broadcasts_queries(plans):
    """The query batch is driver-held and the candidate scan scores all
    queries in one vectorized Arrow pass — no join of any kind, and the
    only exchange is the per-qid ranking window."""
    p = plans["knn_join"]
    assert "CartesianProduct" not in p
    assert "MapInPandas" in p
    assert "Window" in p


def test_q21_semi_and_anti_share_order_key(plans):
    p = plans["sole_late_supplier"]
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q2_argmin_single_window_no_self_join(plans):
    # window MIN formulation: no join operator at all, one agg + one window
    p = plans["min_cost_supplier"]
    assert "Window" in p
    assert "Join" not in p


def test_snapshot_diff_single_outer_join(plans):
    p = plans["snapshot_diff_orders"]
    assert "FullOuter" in p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") == 1


def test_new_tpch_shapes_broadcast_dims(plans):
    """Q9/Q16/Q20 shapes: the selective dimension side must broadcast —
    a shuffle of the fact against a 2k-row dim would be the scale bug."""
    assert "BroadcastHashJoin" in plans["product_profit_by_nation"]
    p16 = plans["supplier_count_by_part"]
    assert "BroadcastHashJoin" in p16 and "LeftAnti" in p16
    p20 = plans["promo_part_suppliers"]
    assert "BroadcastHashJoin" in p20 and "LeftSemi" in p20


def test_price_outliers_no_window_sort(plans):
    """Grouped z-score must use agg+broadcast-join-back, never a window
    (a window would sort every fact partition by group at 100 TB)."""
    p = plans["price_outliers"]
    assert "BroadcastHashJoin" in p
    assert "Window" not in p


def test_tfidf_single_shuffle_topk(plans):
    """TF-IDF ranking: top-k via TakeOrderedAndProject (no global sort)
    and map-side partial aggregation of the exploded tokens."""
    p = plans["tfidf_top_terms"]
    assert "TakeOrderedAndProject" in p
    assert "partial_" in p


def test_text_ngram_partial_agg(plans):
    """bigram/repetition aggregations must collapse map-side (partial
    HashAggregate) so the shuffle carries distinct keys, not token rows."""
    assert "partial_" in plans["bigram_freq"]
    assert "partial_" in plans["doc_repetition"]


def test_doc_chunks_no_join_no_agg_shuffle(plans):
    """Chunking is a narrow map over documents: no join, no aggregate —
    the only allowed exchange is the presentation ORDER BY (which a
    production writer drops)."""
    p = plans["doc_chunks"]
    assert "Join" not in p
    assert "HashAggregate" not in p


def test_contamination_bench_set_broadcasts(plans):
    """The held-out benchmark gram set must be a broadcast-hash probe —
    a sort-merge join of corpus vs corpus would shuffle the full training
    side at 100 TB."""
    p = plans["contamination_check"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_triangles_regime_plans(plans, spark, sf_dir):
    """The round-10 triangle regime ladder, pinned plan by plan:

    - default at fixture scale: DRIVER regime — the returned frame is a
      local one-row relation, zero joins/exchanges (the numpy kernel did
      the work);
    - driver regime off: both the wedge join and the closing join are
      BroadcastHashJoins off one checkpointed edge frame, closing probe
      on the PACKED single long (u·2³² + v → LongHashedRelation);
    - broadcast bound of 0 (the round-9 scale-safety fix: an id-domain
      check alone would force a ~100 M-edge broadcast at sf10+): the
      SAME packed-key joins run as shuffle joins — no broadcast of the
      edge frame anywhere, no CartesianProduct."""
    import delta_unity_duckdb_spark.workload.graphq as GQ

    p = plans["graph_triangles"]
    assert "Join" not in p and "Exchange" not in p, p
    assert "LocalTableScan" in p or "Scan ExistingRDD" in p, p

    orig_rows, orig_bcast = GQ.TRI_DRIVER_MAX_ROWS, GQ.TRI_BCAST_MAX_EDGES
    try:
        GQ.TRI_DRIVER_MAX_ROWS = 0
        pb = plan_of(QUERIES["graph_triangles"](spark, sf_dir))
        assert "CartesianProduct" not in pb
        assert pb.count("BroadcastHashJoin") >= 2
        assert "4294967296" in pb  # the packed closing key is in the plan

        GQ.TRI_BCAST_MAX_EDGES = 0
        # Above the bound there must be NO FORCED broadcast hint: with
        # auto-broadcast off (as a big edge frame's size estimate would
        # turn it off at scale), the plan must fall back to shuffle
        # joins. The old id-domain-only guard F.broadcast()-forced the
        # edge frame regardless — exactly what this pins against.
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ps = plan_of(QUERIES["graph_triangles"](spark, sf_dir))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        assert "CartesianProduct" not in ps
        assert "BroadcastHashJoin" not in ps, ps  # the fallback must engage
        assert "SortMergeJoin" in ps or "ShuffledHashJoin" in ps, ps
        assert "4294967296" in ps  # still the packed long key, just shuffled
    finally:
        GQ.TRI_DRIVER_MAX_ROWS, GQ.TRI_BCAST_MAX_EDGES = orig_rows, orig_bcast


def test_table_profile_pruned_scans(plans):
    """Profiling four columns must read each BYTE once: one scan for the
    streaming aggregates (count/min/max of all columns + stack unpivot)
    plus one column-PRUNED scan per distinct count — each of those must
    read exactly its own column (the bytes sum to one 4-column scan) —
    and never the EXPAND a multi-countDistinct aggregate would plan
    (row replication × N+1 before the shuffle)."""
    p = plans["table_profile"]
    assert p.count("FileScan parquet") == 5
    assert "Expand" not in p
    # every distinct-count scan is pruned to a single column
    one_col_scans = [
        ln for ln in p.splitlines()
        if "ReadSchema: struct<" in ln
        and ln.split("ReadSchema: struct<", 1)[1].count(",") == 0
    ]
    assert len(one_col_scans) >= 4, p


def test_ewma_single_window_shuffle(plans):
    """All eight lags + row_number must evaluate inside one window
    operator over one hashpartitioning(user_id) exchange."""
    p = plans["ewma_trailing"]
    assert p.count("hashpartitioning(user_id") == 1
    assert p.count("Window") <= 2  # one Window op (+ possible header echo)


def test_cohort_single_fact_shuffle(plans):
    """Cohort month must come from a window MIN on the same o_custkey
    partitioning the activity dedup reuses — exactly one fact shuffle
    before the small (cohort, month) rollup."""
    p = plans["cohort_retention"]
    assert p.count("hashpartitioning(o_custkey") == 1
    assert "Window" in p


def test_basket_pairs_keyed_join_no_cartesian(plans, spark, sf_dir):
    """Pair generation must be an equi-join on l_orderkey (quadratic only
    in basket size), never a cartesian or nested-loop product — and it
    must NOT re-shuffle: the collect_set basket fold is the only
    l_orderkey exchange, its exploded output is still hash-partitioned
    on l_orderkey, so the self-join plans sort-only (no Exchange between
    the basket aggregate and the join) and AQE's stage cache executes
    the fold ONCE for all three consumers — pinned on the
    post-execution adaptive plan via ReusedExchange."""
    p = plans["basket_pairs"]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    df = QUERIES["basket_pairs"](spark, sf_dir)
    df.collect()
    executed = plan_of(df)
    assert "ReusedExchange" in executed or "ReusedQueryStage" in executed


# ---------------------------------------------------- round-2 surface
def test_pii_redact_is_zero_shuffle_map(plans):
    """Redaction is a narrow map + top-k: any Exchange would mean the
    regexp work shuffles 100 TB of text for no reason."""
    p = plans["pii_redact"]
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p


def test_kmeans_assignment_is_narrow_arrow_map(plans):
    """Assignment never joins or windows the vector set against the
    centroids, at ANY size tier: below SMALL_KMEANS_ROWS the whole solve
    is the numpy fast path (plan = a local/Arrow relation scan + the
    downstream aggregate), above it the vectorized Arrow MapInPandas
    kernel against driver-held centroids — no cartesian, no join, no
    per-vector window in either plan."""
    p = plans["kmeans_clusters"]
    assert "MapInPandas" in p or "ExistingRDD" in p or "LocalTableScan" in p
    assert "CartesianProduct" not in p
    assert "Join" not in p


def test_sketch_builds_partial_aggregate_before_shuffle(plans):
    """Register/counter builds must map-side combine — the property that
    keeps sketch shuffles at groups x m rows at any input size."""
    assert "partial_max" in plans["hll_distinct_groups"]
    assert "partial_count" in plans["hist_quantile_sketch"]
    assert "partial_sum" in plans["cms_heavy_hitters"]


def test_bloom_probe_broadcasts_position_set(plans):
    p = plans["bloom_join_stats"]
    assert "BroadcastHashJoin" in p


def test_bigram_surprisal_single_lm_shuffle(plans):
    """One bigram-count shuffle + a join back + top-k; the LM join may
    broadcast (small fixture) or sort-merge (at scale) but never
    cartesian."""
    p = plans["bigram_surprisal"]
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_exact_span_census_partial_agg_no_pair_join(plans):
    """The span census is a COUNT window over h — every (doc, span) row
    learns its span's corpus frequency in one exchange; no census
    groupBy + join-back pair, no checkpoint barrier, and never a pair
    join in the plan."""
    p = plans["exact_span_dedup"]
    assert "Window" in p
    assert "CartesianProduct" not in p
    # ONE scan of documents: the window's single consumer means the
    # corpus tokenizes once with no second text pass and no join.
    assert p.count("Scan parquet") == 1
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    # the final per-doc rollup still partial-aggregates map-side
    assert "partial_" in p


def test_winnow_single_window_shuffle(spark, sf_dir, plans):
    """Rolling window-min + per-doc count share ONE hash partitioning on
    id — the rolling min never adds a second exchange for m. Pinned on
    the OPERATOR plan; the registered pairs query materializes this
    frame once via localCheckpoint for its three consumers."""
    from delta_unity_duckdb_spark.operators.dedup import winnow_fingerprints
    from delta_unity_duckdb_spark.sources.tables import load_table

    from tests.test_plans import plan_of  # self-import safe at runtime

    p = plan_of(winnow_fingerprints(load_table(spark, sf_dir, "documents")))
    assert "Window" in p
    assert p.count("Exchange hashpartitioning(id") == 1
    assert "CartesianProduct" not in plans["winnow_fingerprint_pairs"]


def test_embedding_quantization_zero_shuffle(plans):
    """Quantization is a pure narrow map: no Exchange before the output
    TakeOrdered."""
    p = plans["embedding_quantization"]
    assert "Exchange hashpartitioning" not in p
    assert "TakeOrderedAndProject" in p


def test_dim_stats_partial_aggregate(plans):
    """dim-keyed aggregation partial-combines map-side, so the shuffle
    carries dim x partitions rows, not the exploded matrix."""
    p = plans["embedding_dim_stats"]
    assert "partial_" in p
    assert p.count("HashAggregate") >= 2


def test_pca_is_arrow_map_then_tiny_agg(plans):
    """The corpus pass is the Arrow mapInPandas Gram kernel; everything
    after aggregates dim^2-sized partials (partial agg before the one
    shuffle)."""
    p = plans["pca_top_component"]
    # the registered query's visible plan is the driver-built result
    # frame; the Gram pass runs inside the operator — pin it separately
    from delta_unity_duckdb_spark.operators.pca import _make_gram_partials
    from delta_unity_duckdb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    assert p  # result frame plan exists (createDataFrame of 64 rows)


def test_lsh_pairs_dedup_before_vector_attach(plans):
    """Candidate ids dedup BEFORE vectors join back: the duplicate-heavy
    band-collision stream must never shuffle 64-float vectors."""
    p = plans["embedding_pairs_lsh"]
    assert "CartesianProduct" not in p
    # the aggregate implementing dropDuplicates runs on (id_a, id_b)
    # before the vector joins (the first dedup exchange carries no 'v')
    first_dedup = p.split("Exchange hashpartitioning(id_a", 1)
    assert len(first_dedup) == 2


# ---------------------------------------------------- round-4 reworks
def test_semantic_dedup_pair_kernel_is_grouped_arrow(plans):
    """Within-block pair cosine runs as ONE grouped Arrow kernel per
    (cid, sub) block — not a self-join evaluating interpreted
    higher-order-function lambdas per pair — and never a cartesian."""
    p = plans["semantic_dedup_blocks"]
    assert "FlatMapGroupsInPandas" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_user_jaccard_dense_regime_is_tiled_gemm(plans):
    """At fixture scale the regime ladder's user-count gate (>100k for
    set-dedup-first) selects the DENSE branch, so the registered query's
    plan must show the blocked-tile Arrow kernel itself —
    FlatMapGroupsInPandas over the hash-block replication explode
    (Generate) — feeding an exact global TakeOrdered. Never a
    co-occurrence self-join row explosion or a cartesian."""
    p = plans["user_jaccard_pairs"]
    assert "FlatMapGroupsInPandas" in p  # the tiled-GEMM kernel
    assert "Generate" in p  # block replication explode
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_user_jaccard_dedup_regime_plan_shape(spark, sf_dir):
    """The set-dedup-first regime (jaccard_topk_pairs_dedup) never runs
    at fixture scale through the registered query (the >100k-user gate),
    so pin its plan directly: after the eager mask-scoring checkpoint,
    what remains is the bounded member expansion — Generate over kept
    mask pairs into an exact global TakeOrdered — with no cartesian and
    no co-occurrence self-join. Values must match the dense tile plan
    exactly (same total order, same top-k)."""
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators.similarity import (
        dense_jaccard_pairs,
        jaccard_topk_pairs_dedup,
    )
    from delta_unity_duckdb_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    uk = (
        e.filter(F.col("props").isNotNull())
        .select(
            "user_id",
            F.regexp_extract("props", "[0-9]+", 0).cast("bigint").alias("k"),
        )
        .distinct()
    )
    dd = jaccard_topk_pairs_dedup(uk, top_k=50)
    assert dd is not None  # fixture masks are far under max_masks
    p = plan_of(dd)
    assert "Generate" in p  # bounded member-list expansion
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    dense = dense_jaccard_pairs(uk, top_k=50).orderBy(
        F.desc("jaccard_ppm"), "u1", "u2"
    ).limit(50)
    assert [tuple(r) for r in dd.collect()] == [
        tuple(r) for r in dense.collect()
    ]


# ---------------------------------------------------- round-4 additions
def test_hybrid_rrf_arms_are_takeordered(plans):
    """Each fusion arm cuts to top-50 via TakeOrderedAndProject BEFORE any
    single-partition rank window; the dense arm's query vector arrives by
    broadcast. No cartesian anywhere."""
    p = plans["hybrid_rrf_fusion"]
    assert "TakeOrderedAndProject" in p
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_token_budget_many_tiny_regime_is_plain_window(plans):
    """At fixture scale (20 sources × 250 docs — mean docs/source under
    the ladder threshold) the MANY-TINY regime must be chosen: the plain
    per-source running-sum window (partitions = sources, already
    parallel), no shard machinery, no unbounded global window, no
    cartesian."""
    p = plans["token_budget_mixture"]
    assert "CartesianProduct" not in p
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    # the per-source prefix scan orders by the selection hash
    assert any("source" in s and " h#" in s for s in specs), specs
    # the round-8 fix: no unbounded SUM() OVER () window anywhere — the
    # global normalizer is a scalar aggregate + 1-row broadcast
    for s in specs:
        assert s.strip().startswith("source") or "source" in s, s


def test_token_budget_shard_regime_plan_shape(spark, sf_dir, monkeypatch):
    """Threshold injection forces the FEW-HUGE regime on the fixture:
    the boundary-shard decomposition must window the running sum on
    (source, shard) — 64 parallel prefix scans — and never run a
    (source)-only window ordered by the per-doc hash over the corpus."""
    import re

    from delta_unity_duckdb_spark.workload import llm

    monkeypatch.setattr(llm, "_TB_SHARD_MIN_DOCS_PER_SOURCE", 1)
    p = plan_of(llm.token_budget_mixture(spark, sf_dir))
    assert "CartesianProduct" not in p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert any("source" in s and "shard" in s for s in specs), specs
    # any window partitioned by source alone must order by shard (the
    # 64-row-per-source rollup), never by the per-doc hash
    for s in specs:
        if "source" in s and "shard" not in s:
            assert " h#" not in s
    # the two regimes are value-identical (prefix-sum associativity)
    sharded = [tuple(r) for r in llm.token_budget_mixture(spark, sf_dir).collect()]
    monkeypatch.setattr(llm, "_TB_SHARD_MIN_DOCS_PER_SOURCE", 256)
    plain = [tuple(r) for r in llm.token_budget_mixture(spark, sf_dir).collect()]
    assert sharded == plain


def test_leakage_split_no_cartesian_or_allpairs(plans):
    p = plans["leakage_safe_split"]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tokenize_family_has_no_interpreted_lambdas(plans):
    """The round-8 tokenizer rewrite: tokenize plans must express
    non-empty-token extraction as array_remove(split(...), '') — a
    codegen collection expression — with NO higher-order
    lambdafunction left in the tokenize path (the interpreted
    per-element closure measured 4-10x slower over the 5M-doc sf100
    corpus). Pinned on the queries whose plan EXPOSES the tokenize
    (several others hide it behind a localCheckpoint's ExistingRDD
    scan, and bigram_freq keeps a by-design transform() lambda for
    bigram ARRAY CONSTRUCTION — only the token extraction is pinned)."""
    for name in ("shard_manifest", "inverted_index", "doc_chunks"):
        p = plans[name].lower()
        assert "lambdafunction" not in p, name
        assert "array_remove" in p, name
    # nowhere in the registry does a filter-lambda tokenize survive
    for name, p in plans.items():
        assert not HOF_FILTER_NEEDLE.search(p.lower()), name


# Matches this Spark's printer for a filter(..., t -> t != '') lambda:
#   lambdafunction(not (lambda x_1#2 = ), ...)
# (round-8 note: an earlier exact-literal needle used the
# namedlambdavariable() spelling, which THIS printer never emits — the
# registry sweep was vacuously green; the control test below keeps it real.)
HOF_FILTER_NEEDLE = __import__("re").compile(
    r"lambdafunction\(\(?not \((?:lambda )?[a-z0-9_#]+\(?\)? = \)"
)


def test_hof_filter_needle_matches_real_plans(spark):
    """Self-test the needle: the registry-wide 'no filter-lambda tokenize'
    assertion above greps plans for Spark's plan-printer rendering of an
    HOF not-equals filter. If a Spark upgrade reformats HOF filters, that
    grep would go vacuously true — so build a control plan that IS the
    banned shape (filter(split(lower(txt),' '), t -> t != '')) and require
    the needle to hit it. A printer change fails HERE, loudly."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a b  c",)], "txt string").select(
        F.filter(
            F.split(F.lower("txt"), " "), lambda t: t != F.lit("")
        ).alias("toks")
    )
    control = plan_of(df).lower()
    assert "lambdafunction" in control
    assert HOF_FILTER_NEEDLE.search(control), (
        "plan printer changed; update HOF_FILTER_NEEDLE so the registry "
        "sweep keeps teeth: " + control
    )


def test_sliding_window_preaggregates_fine_grain(plans):
    """sliding_window must NOT expand raw rows through the F.window
    Generate (2x the corpus through the aggregate): the explode runs on
    the ~1e4-row fine aggregate. In the printed plan (root first, scan
    last) the segment below the DEEPEST Exchange — the fine aggregate's
    shuffle, partial agg, and scan — must contain no Generate."""
    p = plans["sliding_window"]
    scan_side = p.rsplit("Exchange", 1)[1]
    assert "Scan" in scan_side
    assert "Generate" not in scan_side, "Generate must stay above the fine aggregate"


def test_tumbling_window_single_pass_no_expand(plans):
    """Round-9 closure pin (SCALE_BENCH_sf500_tumbling_r09.json): the
    ~2.2x sf500 asymptote vs DuckDB is the composite (timestamp, string)
    group key — three measured alternatives all lost (hash-surrogate
    keys, type-pivoted aggregates, broadcast dictionary-encode, which
    costs a second full scan). What must never regress is the single
    pass: one parquet scan, no Generate/Expand row multiplication, and
    map-side partial aggregation before the exchange."""
    p = plans["tumbling_window"]
    assert p.count("Scan parquet") == 1
    assert "Generate" not in p and "Expand" not in p
    assert "partial_" in p
