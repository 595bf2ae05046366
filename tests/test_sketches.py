"""Sketch operator tests: mergeability (exact), accuracy bounds vs ground
truth, one-sided error guarantees, and partition independence.

The workload-level oracle twins (workload/sketches.py) already verify
engine-exactness; these tests verify the SKETCH MATH — merge algebra,
error bounds, no-false-negative guarantees — which an oracle that replays
the same arithmetic cannot."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators import sketches as SK
from delta_unity_duckdb_spark.sources.tables import load_table


def _rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


# ------------------------------------------------------------------- HLL
def test_hll_merge_equals_sketch_of_union(spark, sf_dir):
    """Register-wise MAX of two half-sketches must equal the sketch of
    the whole table EXACTLY — the property that makes daily sketches
    roll up without rescanning."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_orderkey") % 2 == 0)
    hi = li.filter(F.col("l_orderkey") % 2 == 1)
    whole = SK.hll_sketch(li, ["l_returnflag"], "l_partkey")
    merged = SK.hll_merge(
        SK.hll_sketch(lo, ["l_returnflag"], "l_partkey"),
        SK.hll_sketch(hi, ["l_returnflag"], "l_partkey"),
        ["l_returnflag"],
    )
    assert _rows(whole, "l_returnflag", "reg") == _rows(
        merged, "l_returnflag", "reg"
    )


def test_hll_merge_idempotent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sk = SK.hll_sketch(li, ["l_returnflag"], "l_partkey")
    remerged = SK.hll_merge(sk, sk, ["l_returnflag"])
    assert _rows(sk, "l_returnflag", "reg") == _rows(
        remerged, "l_returnflag", "reg"
    )


def test_hll_estimate_accuracy(spark, sf_dir):
    """p=6 → standard error 1.04/sqrt(64) ≈ 13%; assert within 4 sigma."""
    li = load_table(spark, sf_dir, "lineitem")
    est = {
        r["l_returnflag"]: r["hll_distinct"]
        for r in SK.hll_estimate(
            SK.hll_sketch(li, ["l_returnflag"], "l_partkey"), ["l_returnflag"]
        ).collect()
    }
    true = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for g, t in true.items():
        assert abs(est[g] - t) / t < 0.52, (g, est[g], t)


def test_hll_partition_independence(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = SK.hll_estimate(
        SK.hll_sketch(li.repartition(1), ["l_returnflag"], "l_partkey"),
        ["l_returnflag"],
    )
    b = SK.hll_estimate(
        SK.hll_sketch(li.repartition(13), ["l_returnflag"], "l_partkey"),
        ["l_returnflag"],
    )
    assert _rows(a, "l_returnflag") == _rows(b, "l_returnflag")


# ------------------------------------------------------------------- KMV
def test_kmv_merge_equals_sketch_of_union(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    lo = o.filter(F.col("o_orderkey") % 2 == 0)
    hi = o.filter(F.col("o_orderkey") % 2 == 1)
    whole = SK.kmv_sketch(o, ["o_orderpriority"], "o_custkey", k=32)
    merged = SK.kmv_merge(
        SK.kmv_sketch(lo, ["o_orderpriority"], "o_custkey", k=32),
        SK.kmv_sketch(hi, ["o_orderpriority"], "o_custkey", k=32),
        ["o_orderpriority"],
        k=32,
    )
    assert _rows(whole, "o_orderpriority", "rn") == _rows(
        merged, "o_orderpriority", "rn"
    )


def test_kmv_estimate_accuracy_and_exact_below_k(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    est = {
        r["o_orderpriority"]: (r["n_kept"], r["kmv_distinct"])
        for r in SK.kmv_estimate(
            SK.kmv_sketch(o, ["o_orderpriority"], "o_custkey", k=64),
            ["o_orderpriority"],
            k=64,
        ).collect()
    }
    true = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for g, t in true.items():
        n_kept, e = est[g]
        if t < 64:
            assert n_kept == t and e == float(t)  # exact regime
        else:
            # RSE ≈ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
            assert abs(e - t) / t < 0.51, (g, e, t)


def test_kmv_salted_two_stage_matches_direct_rank(spark, sf_dir):
    """The salt only bounds per-task state — different salt fan-outs must
    produce the identical sketch."""
    o = load_table(spark, sf_dir, "orders")
    a = SK.kmv_sketch(o, ["o_orderpriority"], "o_custkey", k=16, salt=2)
    b = SK.kmv_sketch(o, ["o_orderpriority"], "o_custkey", k=16, salt=256)
    assert _rows(a, "o_orderpriority", "rn") == _rows(b, "o_orderpriority", "rn")


# -------------------------------------------------------------- Count-Min
def _token_counts(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_cms_one_sided_error(spark, sf_dir):
    """CMS never underestimates: est >= true for EVERY key."""
    tc = _token_counts(spark, sf_dir)
    counters = SK.cms_counters(tc, "word", "n", width=256)
    est = SK.cms_estimate(counters, tc.select("word"), "word", width=256)
    joined = tc.join(est, "word").select("word", "n", "cms_est").collect()
    assert len(joined) > 0
    for r in joined:
        assert r["cms_est"] >= r["n"], (r["word"], r["cms_est"], r["n"])


def test_cms_merge_is_counter_sum(spark, sf_dir):
    """Sketch(A) + Sketch(B) == Sketch(A ∪ B) element-wise — mergeable
    across days/partitions by summing counters."""
    tc = _token_counts(spark, sf_dir)
    lo = tc.filter(F.length("word") <= 4)
    hi = tc.filter(F.length("word") > 4)
    whole = SK.cms_counters(tc, "word", "n", width=256)
    summed = (
        SK.cms_counters(lo, "word", "n", width=256)
        .unionByName(SK.cms_counters(hi, "word", "n", width=256))
        .groupBy("row_i", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _rows(whole, "row_i", "pos") == _rows(summed, "row_i", "pos")


def test_cms_bounded_size(spark, sf_dir):
    counters = SK.cms_counters(
        _token_counts(spark, sf_dir), "word", "n", width=64
    )
    assert counters.count() <= 4 * 64


# ------------------------------------------------------------------ Bloom
def test_bloom_no_false_negatives(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    positions = SK.bloom_build(dim, "c_custkey")
    probe = o.select(F.col("o_custkey").alias("k")).distinct()
    passed = {r["k"] for r in SK.bloom_probe(probe, positions, "k").collect()}
    true = {
        r["k"]
        for r in probe.join(
            dim.withColumnRenamed("c_custkey", "k"), "k", "semi"
        ).collect()
    }
    assert true <= passed  # every true match passes the filter
    # and the filter actually filters: pass set ≪ probe set
    n_probe = probe.count()
    if n_probe > 100:
        assert len(passed) < n_probe


def test_bloom_positions_bounded(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    pos = SK.bloom_build(c.select("c_custkey"), "c_custkey", m=512)
    assert pos.count() <= 512


# ----------------------------------------------------------- plan shapes
def test_hll_sketch_partial_aggregates_before_shuffle(spark, sf_dir):
    """The register build must map-side combine: two HashAggregates with
    a partial_ phase, and exactly one exchange — the property that keeps
    the shuffle at groups × m rows at any input size."""
    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        SK.hll_sketch(li, ["l_returnflag"], "l_partkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2
    assert "partial_max" in plan


def test_cms_probe_broadcasts_counters(spark, sf_dir):
    tc = _token_counts(spark, sf_dir)
    counters = SK.cms_counters(tc, "word", "n", width=256)
    est = SK.cms_estimate(counters, tc.select("word"), "word", width=256)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_kmv_set_ops_accuracy(spark, sf_dir):
    """Theta-sketch intersection estimate lands within sampling error of
    the true intersection (RSE ~ 1/sqrt(k) on the union scale)."""
    from delta_unity_duckdb_spark.workload.sketches import kmv_set_ops

    r = kmv_set_ops(spark, sf_dir).collect()[0]
    true = r["true_intersection"]
    assert r["n_common_kept"] >= 0
    assert r["union_est"] > 0
    if true > 0:
        # allow generous 4-sigma band on the union-scaled estimator
        assert abs(r["inter_est"] - true) / max(true, 1) < 1.0, dict(r.asDict())


def test_hist_sketch_merge_is_counter_sum(spark, sf_dir):
    """Per-half histograms SUM to the whole-table histogram exactly —
    mergeable quantiles across days/partitions."""
    e = load_table(spark, sf_dir, "events")
    lo = e.filter(F.col("event_id") % 2 == 0)
    hi = e.filter(F.col("event_id") % 2 == 1)
    whole = SK.hist_sketch(e, ["event_type"], "value", 0.0, 1000.0, 50)
    summed = (
        SK.hist_sketch(lo, ["event_type"], "value", 0.0, 1000.0, 50)
        .unionByName(SK.hist_sketch(hi, ["event_type"], "value", 0.0, 1000.0, 50))
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _rows(whole, "event_type", "bin") == _rows(summed, "event_type", "bin")


def test_hist_quantiles_within_bin_width_of_exact(spark, sf_dir):
    """Estimate error is bounded by bin width (5.0 here) for in-range data."""
    e = load_table(spark, sf_dir, "events")
    sk = SK.hist_sketch(e, ["event_type"], "value", 0.0, 1000.0, 200)
    est = {
        (r["event_type"], r["q"]): r["est"]
        for r in SK.hist_quantiles(
            sk, ["event_type"], [0.5, 0.9], 0.0, 1000.0, 200
        ).collect()
    }
    exact = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    ).collect()
    for r in exact:
        assert abs(est[(r["event_type"], 0.5)] - r["p50"]) <= 5.0
        assert abs(est[(r["event_type"], 0.9)] - r["p90"]) <= 5.0
