"""Skyline operator: equivalence to the naive dominance definition on
random inputs, plus structural edge cases (ties, duplicates, single
bucket, monotone chains)."""

from __future__ import annotations

import random

from delta_unity_duckdb_spark.operators.skyline import skyline2d


def _naive(points):
    pts = set(points)
    out = []
    for p in pts:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in pts
            if q != p
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, points):
    df = spark.createDataFrame(points, ["a", "b"])
    got = sorted(tuple(r) for r in skyline2d(df, "a", "b").collect())
    assert got == _naive(points), f"mismatch for {points[:10]}..."


def test_random_equivalence(spark):
    rng = random.Random(42)
    for _ in range(5):
        pts = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(300)]
        _run(spark, pts)


def test_duplicates_and_ties(spark):
    # duplicate points don't dominate each other; ties on one dim do
    _run(spark, [(1, 5), (1, 5), (1, 4), (2, 4), (0, 9), (0, 9)])


def test_single_point_and_constant_x(spark):
    _run(spark, [(3, 3)])
    _run(spark, [(7, 1), (7, 2), (7, 3)])  # xmax == xmin → one bucket


def test_monotone_chain_all_skyline(spark):
    # strictly decreasing y with increasing x: every point is optimal
    pts = [(i, 100 - i) for i in range(100)]
    _run(spark, pts)


def test_reverse_chain_single_winner(spark):
    # y increases with x: only the first point survives
    pts = [(i, i) for i in range(100)]
    _run(spark, pts)
