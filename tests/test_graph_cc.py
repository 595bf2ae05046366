"""connected_components unit tests — merge shapes the fixture chains lack."""

from __future__ import annotations

from delta_unity_duckdb_spark.operators.graph import connected_components


def _cc(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = connected_components(edges)
    return {r.node: r.component for r in got.collect()}


def test_two_chains_and_a_bridge(spark):
    # 1-2-3-4 and 10-11-12, then 4-10 bridges them into one component
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (4, 10)]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {1}
    assert len(labels) == 7


def test_disjoint_components_keep_min_labels(spark):
    edges = [(5, 6), (6, 7), (20, 21), (40, 41), (41, 42), (42, 40)]  # incl. a cycle
    labels = _cc(spark, edges)
    assert labels == {5: 5, 6: 5, 7: 5, 20: 20, 21: 20, 40: 40, 41: 40, 42: 40}


def test_star_and_long_chain(spark):
    # star centered far from its min id + a 64-node chain (pointer jumping
    # must converge well under max_iter=32 ≈ 2^32 hop coverage)
    star = [(100, i) for i in range(90, 100)]
    chain = [(i, i + 1) for i in range(200, 264)]
    labels = _cc(spark, star + chain)
    assert {labels[n] for n in range(90, 101)} == {90}
    assert {labels[n] for n in range(200, 265)} == {200}


def test_direction_is_ignored(spark):
    # edges given "backwards" — undirected semantics must still merge
    labels = _cc(spark, [(3, 1), (2, 3)])
    assert labels == {1: 1, 2: 1, 3: 1}
