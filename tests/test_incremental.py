"""Incremental materialized-aggregate maintenance (operators/incremental.py):
refresh applies only unseen commits, is idempotent, and always equals a
from-scratch recompute in exact DECIMAL."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.numeric import dec
from delta_unity_duckdb_spark.operators.incremental import (
    read_materialized_agg,
    refresh_incremental_agg,
)
from delta_unity_duckdb_spark.sources.delta_log import write_delta


def _full(df, keys, col):
    return {
        tuple(r)[:-2] + (str(r[-2]), r[-1])
        for r in df.groupBy(*keys)
        .agg(F.sum(dec(col)).cast("decimal(38,6)").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _state(spark, path, keys):
    return {
        tuple(r)[:-2] + (str(r[-2]), r[-1])
        for r in read_materialized_agg(spark, path, keys)
        .withColumnsRenamed({"sum_value": "s"})
        .collect()
    }


def test_refresh_tracks_commits(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    base = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    write_delta(base.filter(F.col("v") < 60), src)
    r1 = refresh_incremental_agg(spark, src, state, ["k"], "v")
    assert r1["refreshed"] and r1["synced_version"] == 0

    write_delta(base.filter(F.col("v") >= 60), src)
    r2 = refresh_incremental_agg(spark, src, state, ["k"], "v")
    assert r2["commits_applied"] == 1

    from delta_unity_duckdb_spark.sources.delta_log import read_delta

    assert _state(spark, state, ["k"]) == _full(read_delta(spark, src), ["k"], "v")


def test_noop_refresh_and_idempotency(spark, tmp_path):
    src, state = str(tmp_path / "src2"), str(tmp_path / "state2")
    df = spark.range(50).select(
        (F.col("id") % 2).cast("string").alias("k"), F.col("id").cast("double").alias("v")
    )
    write_delta(df, src)
    refresh_incremental_agg(spark, src, state, ["k"], "v")
    before = _state(spark, state, ["k"])
    r = refresh_incremental_agg(spark, src, state, ["k"], "v")  # nothing new
    assert not r["refreshed"] and r["commits_applied"] == 0
    assert _state(spark, state, ["k"]) == before


def test_multi_commit_catchup_in_one_refresh(spark, tmp_path):
    src, state = str(tmp_path / "src3"), str(tmp_path / "state3")
    df = spark.range(90).select(
        (F.col("id") % 3).cast("string").alias("k"), (F.col("id") + 0.25).alias("v")
    )
    for part in range(3):
        write_delta(df.filter(F.col("id") % 3 == part), src)
    r = refresh_incremental_agg(spark, src, state, ["k"], "v")
    assert r["commits_applied"] == 3  # catches up (last=-1 → now=2) at once

    from delta_unity_duckdb_spark.sources.delta_log import read_delta

    assert _state(spark, state, ["k"]) == _full(read_delta(spark, src), ["k"], "v")


def test_non_append_commit_triggers_full_rebuild(spark, tmp_path):
    """An overwrite between refreshes invalidates incremental state; the
    refresh must detect it (CDC raises on removes) and rebuild from the
    current snapshot instead of silently double-counting."""
    src, state = str(tmp_path / "src4"), str(tmp_path / "state4")
    df = spark.range(40).select(
        (F.col("id") % 2).cast("string").alias("k"), F.col("id").cast("double").alias("v")
    )
    write_delta(df, src)
    refresh_incremental_agg(spark, src, state, ["k"], "v")

    replacement = spark.range(100, 120).select(
        (F.col("id") % 2).cast("string").alias("k"), F.col("id").cast("double").alias("v")
    )
    write_delta(replacement, src, mode="overwrite")
    r = refresh_incremental_agg(spark, src, state, ["k"], "v")
    assert r["refreshed"] and r["rebuilt"]

    from delta_unity_duckdb_spark.sources.delta_log import read_delta

    assert _state(spark, state, ["k"]) == _full(read_delta(spark, src), ["k"], "v")
