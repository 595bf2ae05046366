"""Interval (range) join: points joined into [start, end) intervals.

The reference exposes arbitrary SQL through its DuckDB passthrough
(delta-unity-duckdb.js:331-339), which plans `b.ts BETWEEN a.lo AND a.hi`
as an IEJoin. Spark's Catalyst has no inequality-join operator — a naive
`left.join(right, (ts >= lo) & (ts < hi))` falls back to
BroadcastNestedLoopJoin, which is O(|L|·|R|) and a non-starter at 100 TB.

Spark-first strategy: discretize time into fixed-width buckets.

* each interval is exploded to the buckets it covers (``sequence`` —
  bounded fanout of ceil(span/width)+1 rows per interval);
* each point maps to exactly ONE bucket (``floor(ts/width)``);
* equi-join on bucket (hash-partitionable, AQE/skew-join friendly), then
  refine with the exact range predicate.

Because the buckets partition the timeline and a point lives in exactly
one bucket, a (interval, point) pair can only meet in that point's bucket
— the join is duplicate-free by construction, no dedup pass needed.

Choosing ``bucket_width`` ≈ the typical interval span keeps the fanout at
~2 and the shuffle linear in the input. All arithmetic stays in Spark
built-ins (whole-stage codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _bucket_of(ts: Column, width_us: int) -> Column:
    # TIMESTAMP_NTZ → TIMESTAMP is identity under the engine's fixed UTC
    # session timezone (session.py); unix_micros only accepts TIMESTAMP.
    return F.floor(F.unix_micros(ts.cast("timestamp")) / F.lit(width_us))


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    ts: str,
    bucket_width_seconds: int = 300,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Join each row of ``points`` to every interval with
    ``start <= ts < end``. Columns from both sides are kept (points
    columns win on name collision — callers should pre-alias).

    ``extra_keys``: equality keys required on both sides (e.g. a tenant
    or user id) — folded into the join key so co-partitioning holds.
    """
    width_us = bucket_width_seconds * 1_000_000
    keys = list(extra_keys or [])

    # Interval side: one row per covered bucket. end is exclusive, so the
    # last covered bucket is bucket_of(end - 1µs).
    lo = _bucket_of(F.col(start), width_us)
    hi = _bucket_of(F.col(end) - F.expr("INTERVAL 1 MICROSECOND"), width_us)
    left = intervals.withColumn(_BUCKET, F.explode(F.sequence(lo, hi)))

    right = points.withColumn(_BUCKET, _bucket_of(F.col(ts), width_us))

    joined = left.join(right, on=[_BUCKET, *keys], how="inner").drop(_BUCKET)
    return joined.filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
