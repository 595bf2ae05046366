"""Interval (range) join — semantics and plan-shape tests.

The operator replaces the nested-loop theta join DuckDB's IEJoin would run
(reference passthrough surface) with a bucketed equi-join; these tests pin
the exact-boundary semantics ([start, end) half-open), the multi-bucket
fanout path, the duplicate-free guarantee, and the plan (hash equi-join,
never BroadcastNestedLoopJoin / CartesianProduct).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark, intervals, points):
    idf = spark.createDataFrame(
        [(i, _ts(a), _ts(b)) for i, a, b in intervals],
        "iv_id int, w_start timestamp, w_end timestamp",
    )
    pdf = spark.createDataFrame(
        [(j, _ts(t)) for j, t in points], "pt_id int, c_ts timestamp"
    )
    return idf, pdf


def _pairs(spark, intervals, points, width=300):
    idf, pdf = _frames(spark, intervals, points)
    out = interval_join(
        idf, pdf, start="w_start", end="w_end", ts="c_ts", bucket_width_seconds=width
    )
    return sorted((r.iv_id, r.pt_id) for r in out.collect())


def test_half_open_boundaries(spark):
    """start is inclusive, end is exclusive — exactly-at-end must NOT match."""
    pairs = _pairs(
        spark,
        [(1, "2024-01-01 00:00:00", "2024-01-01 00:05:00")],
        [
            (10, "2024-01-01 00:00:00"),  # == start → in
            (11, "2024-01-01 00:04:59.999999"),  # last µs → in
            (12, "2024-01-01 00:05:00"),  # == end → out
            (13, "2023-12-31 23:59:59.999999"),  # before → out
        ],
    )
    assert pairs == [(1, 10), (1, 11)]


def test_interval_spanning_many_buckets(spark):
    """An interval much wider than the bucket still matches points in every
    covered bucket (explode fanout), each exactly once."""
    pairs = _pairs(
        spark,
        [(1, "2024-01-01 00:00:30", "2024-01-01 00:20:30")],
        [(i, f"2024-01-01 00:{i:02d}:00") for i in range(25)],
        width=60,  # 1-minute buckets, 20-minute interval → 21 buckets
    )
    matched = [p for _, p in pairs]
    assert matched == list(range(1, 21))
    assert len(set(pairs)) == len(pairs)  # duplicate-free


def test_overlapping_intervals_each_match(spark):
    pairs = _pairs(
        spark,
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00"),
            (2, "2024-01-01 00:05:00", "2024-01-01 00:15:00"),
        ],
        [(10, "2024-01-01 00:07:00")],
    )
    assert pairs == [(1, 10), (2, 10)]


def test_extra_keys_scope_the_match(spark):
    idf = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        "iv_id int, user string, w_start timestamp, w_end timestamp",
    )
    pdf = spark.createDataFrame(
        [
            ("u1", 10, _ts("2024-01-01 00:30:00")),
            ("u2", 11, _ts("2024-01-01 00:30:00")),
        ],
        "user string, pt_id int, c_ts timestamp",
    )
    out = interval_join(
        idf, pdf, start="w_start", end="w_end", ts="c_ts", extra_keys=["user"]
    )
    assert [(r.iv_id, r.pt_id) for r in out.collect()] == [(1, 10)]


def test_matches_naive_theta_join(spark):
    """Differential check against the quadratic plan on a small input."""
    intervals = [
        (i, f"2024-01-01 00:{i:02d}:10", f"2024-01-01 00:{(i + 7) % 60:02d}:10")
        for i in range(0, 50, 3)
    ]
    intervals = [(i, a, b) for i, a, b in intervals if a < b]
    points = [(j, f"2024-01-01 00:{j % 60:02d}:{(j * 13) % 60:02d}") for j in range(80)]
    idf, pdf = _frames(spark, intervals, points)
    naive = idf.join(
        pdf, (F.col("c_ts") >= F.col("w_start")) & (F.col("c_ts") < F.col("w_end"))
    )
    expected = sorted((r.iv_id, r.pt_id) for r in naive.collect())
    assert _pairs(spark, intervals, points, width=120) == expected


def test_plan_is_equi_join_not_nested_loop(spark):
    idf, pdf = _frames(
        spark,
        [(1, "2024-01-01 00:00:00", "2024-01-01 00:05:00")],
        [(10, "2024-01-01 00:01:00")],
    )
    out = interval_join(idf, pdf, start="w_start", end="w_end", ts="c_ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


# ---------------------------------------------------------------- property test
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_BASE = dt.datetime(2024, 1, 1)

# offsets in seconds over a ~2h span; widths up to 40 min so intervals
# cover 0..9 buckets at the 300s default width
_iv = st.tuples(st.integers(0, 7200), st.integers(0, 2400))
_pt = st.integers(0, 9600)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ivs=st.lists(_iv, min_size=0, max_size=12),
    pts=st.lists(_pt, min_size=0, max_size=30),
)
def test_interval_join_equals_naive_for_any_input(spark, ivs, pts):
    intervals = [
        (i, _BASE + dt.timedelta(seconds=a), _BASE + dt.timedelta(seconds=a + w))
        for i, (a, w) in enumerate(ivs)
        if w > 0
    ]
    points = [(j, _BASE + dt.timedelta(seconds=s)) for j, s in enumerate(pts)]
    idf = spark.createDataFrame(
        intervals or [], "iv_id int, w_start timestamp, w_end timestamp"
    )
    pdf = spark.createDataFrame(points or [], "pt_id int, c_ts timestamp")
    got = sorted(
        (r.iv_id, r.pt_id)
        for r in interval_join(
            idf, pdf, start="w_start", end="w_end", ts="c_ts"
        ).collect()
    )
    expected = sorted(
        (i, j)
        for i, a, b in intervals
        for j, t in points
        if a <= t < b
    )
    assert got == expected
