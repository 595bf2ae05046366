"""Fixed-point k-means tests: determinism under repartitioning, k-means
invariants (coverage, monotone improvement), and quantization sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators import clustering as C
from delta_unity_duckdb_spark.sources.tables import load_table


def _assign_rows(df):
    return sorted((r["vid"], r["cid"], r["dist"]) for r in df.collect())


def test_kmeans_partition_independent(spark, sf_dir):
    """Fixed-point arithmetic means the ENTIRE iteration — not just the
    final labels — is identical however the input is partitioned; this is
    the property float k-means cannot give on a cluster."""
    e = load_table(spark, sf_dir, "embeddings")
    a = C.kmeans_fixed_point(e.repartition(1), k=4, iters=2)
    b = C.kmeans_fixed_point(e.repartition(11), k=4, iters=2)
    assert _assign_rows(a) == _assign_rows(b)


def test_kmeans_assigns_every_vector_to_valid_cluster(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    a = C.kmeans_fixed_point(e, k=4, iters=1)
    n = e.count()
    assert a.count() == n
    assert a.select("vid").distinct().count() == n
    cids = {r["cid"] for r in a.select("cid").distinct().collect()}
    assert cids <= set(range(1, 5))


def test_kmeans_iterations_do_not_increase_wss(spark, sf_dir):
    """Lloyd's algorithm decreases within-cluster sum of squares each
    round; floor-quantized centroids can deviate from the true mean by
    <1 grid step per coordinate, so allow a hair of slack."""
    e = load_table(spark, sf_dir, "embeddings")
    wss = []
    for iters in (0, 1, 2):
        a = C.kmeans_fixed_point(e, k=4, iters=iters)
        wss.append(a.agg(F.sum("dist")).collect()[0][0])
    assert wss[1] <= wss[0] * 1.001
    assert wss[2] <= wss[1] * 1.001


def test_quantize_vec_floor_grid(spark):
    df = spark.createDataFrame(
        [(1, [0.123456789, -0.123456789, 0.0])], "id long, v array<double>"
    )
    got = df.select(C.quantize_vec(F.col("v")).alias("q")).collect()[0]["q"]
    assert got == [12345, -12346, 0]  # floor, not round-half — and exact


def test_kmeans_more_clusters_lower_wss(spark, sf_dir):
    """More centroids can only tighten the fit (init is nested: the k=2
    seeds are a subset of the k=8 seeds)."""
    e = load_table(spark, sf_dir, "embeddings")
    w2 = (
        C.kmeans_fixed_point(e, k=2, iters=1)
        .agg(F.sum("dist"))
        .collect()[0][0]
    )
    w8 = (
        C.kmeans_fixed_point(e, k=8, iters=1)
        .agg(F.sum("dist"))
        .collect()[0][0]
    )
    assert w8 <= w2


def test_literal_form_matches_distributed_form(spark, sf_dir):
    """The driver-held-centroid Arrow form must be VALUE-IDENTICAL to the
    fully distributed join+window form — same exact-integer distances,
    same floor means, same lowest-cid tie-break (numpy argmin takes the
    first minimum and centroids are cid-ordered). cid dtype differs
    (int vs long) by construction; values must not."""
    e = load_table(spark, sf_dir, "embeddings")
    for iters in (0, 1, 2):
        a = {
            (r["vid"], int(r["cid"]), r["dist"])
            for r in C.kmeans_fixed_point(e, k=4, iters=iters).collect()
        }
        b = {
            (r["vid"], int(r["cid"]), r["dist"])
            for r in C.kmeans_fixed_point_literal(e, k=4, iters=iters).collect()
        }
        assert a == b
        # force the driver-loop + Arrow-map Spark path (numpy whole-problem
        # fast path disabled) — all three implementations must agree
        orig = C.SMALL_KMEANS_ROWS
        C.SMALL_KMEANS_ROWS = 0
        try:
            c = {
                (r["vid"], int(r["cid"]), r["dist"])
                for r in C.kmeans_fixed_point_literal(
                    e, k=4, iters=iters
                ).collect()
            }
        finally:
            C.SMALL_KMEANS_ROWS = orig
        assert a == c


def test_literal_form_empty_seed_set(spark):
    """All vector ids >= k (no seeds): both size tiers must return the
    same empty typed frame the distributed form does, not crash."""
    df = spark.createDataFrame(
        [(100, [0.1, 0.2]), (101, [0.3, 0.4])],
        "vec_id long, embedding array<double>",
    )
    out = C.kmeans_fixed_point_literal(df, k=8, iters=1)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vid", "cid", "dist"]
    orig = C.SMALL_KMEANS_ROWS
    C.SMALL_KMEANS_ROWS = 0
    try:
        out2 = C.kmeans_fixed_point_literal(df, k=8, iters=1)
        assert out2.count() == 0
    finally:
        C.SMALL_KMEANS_ROWS = orig
