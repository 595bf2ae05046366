"""Streaming ≡ batch equivalence: the same windowed aggregations computed
via Structured Streaming (availableNow over the fixture) must match the
batch DataFrame plan on identical input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    stateful_running_totals,
    stream_to_parquet,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    # Align with the stream's TIMESTAMP type (session tz = UTC) so window
    # boundaries and collected values compare exactly.
    return load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_tumbling_stream_matches_batch(spark, sf_dir, batch_events):
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, output_mode="complete")
    want = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_sliding_stream_matches_batch(spark, sf_dir, batch_events):
    stream = sliding_counts(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, output_mode="complete")
    want = (
        batch_events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    assert _rows(got, "window_start") == _rows(want, "window_start")


def test_session_stream_matches_batch(spark, sf_dir, batch_events):
    stream = session_counts(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, output_mode="complete")
    want = (
        batch_events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    assert _rows(got, "session_start", "user_id") == _rows(
        want, "session_start", "user_id"
    )


def test_stateful_running_totals(spark, sf_dir, batch_events):
    """applyInPandasWithState totals over one availableNow drain must equal
    the batch per-user aggregate (update mode: last row per user wins)."""
    stream = stateful_running_totals(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, output_mode="update")
    # update-mode memory sink appends every emission; keep the final state
    # per user (max n_events is monotone in batches).
    final = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
    )
    want = batch_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("sum_value"),
    )
    g = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in final.collect()}
    w = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in want.collect()}
    assert g == w


def test_foreach_batch_parquet_sink(spark, sf_dir, batch_events, tmp_path):
    stream = read_events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = stream_to_parquet(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    written = spark.read.parquet(str(tmp_path / "out"))
    assert written.count() == batch_events.count()
    assert set(written.columns) == {"event_id", "user_id", "value"}


def test_stream_dedup_within_watermark(spark, sf_dir, batch_events):
    """Re-delivered events (union of the stream source with itself via two
    reads) collapse back to the distinct id set."""
    from delta_unity_duckdb_spark.streaming.events import dedup_events_stream

    s1 = read_events_stream(spark, sf_dir)
    s2 = read_events_stream(spark, sf_dir)
    doubled = s1.union(s2)  # every event delivered twice
    deduped = dedup_events_stream(doubled).select("event_id")
    got = run_available_now(deduped, output_mode="append")
    assert got.count() == batch_events.count()
    assert got.distinct().count() == batch_events.count()


def test_stream_hll_registers_equal_batch_sketch(spark, sf_dir, batch_events):
    """The streaming HLL state must be EXACTLY the batch sketch of the
    same input (mergeable state ⇒ micro-batch order cannot matter), and
    it must be bounded: ≤ 2^p rows per window however many users appear."""
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators.sketches import hll_sketch
    from delta_unity_duckdb_spark.streaming.events import (
        read_events_stream,
        run_available_now,
    )

    e = read_events_stream(spark, sf_dir)
    windowed = e.withWatermark("ts", "10 minutes").select(
        F.window("ts", "10 minutes").alias("win"), "user_id"
    )
    streamed = run_available_now(
        hll_sketch(windowed, ["win"], "user_id", p=6), output_mode="complete"
    )
    batch = hll_sketch(
        batch_events.select(
            F.window("ts", "10 minutes").alias("win"), "user_id"
        ),
        ["win"],
        "user_id",
        p=6,
    )
    key = lambda df: sorted(
        (r["win"]["start"], r["reg"], r["max_rho"]) for r in df.collect()
    )
    assert key(streamed) == key(batch)
    per_window = streamed.groupBy("win").count().agg(F.max("count")).collect()
    assert per_window[0][0] <= 64


def test_stream_incremental_dedup_equals_batch(spark, sf_dir):
    """Streaming-batch equivalence for the ingest-dedup twin: identical
    verdict rows on complete input, and the fixtures contain no
    empty-shingle docs (the one documented divergence)."""
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.sources.tables import load_table
    from delta_unity_duckdb_spark.workload.llm import incremental_near_dup_ingest
    from delta_unity_duckdb_spark.workload.streamq import stream_incremental_dedup

    d = load_table(spark, sf_dir, "documents")
    n_empty = d.filter(F.trim(F.col("text")) == "").count()
    assert n_empty == 0
    batch = {tuple(r) for r in incremental_near_dup_ingest(spark, sf_dir).collect()}
    stream = {tuple(r) for r in stream_incremental_dedup(spark, sf_dir).collect()}
    assert batch == stream


def test_late_data_drop_actually_drops(spark, sf_dir):
    """The 3-batch replay must DROP most straggler rows: the final window
    totals are far below the full-table totals, and every window present
    either is recent or was still open (end > watermark) when the late
    batch arrived."""
    import datetime

    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.sources.tables import load_table
    from delta_unity_duckdb_spark.workload.streamq import stream_late_data_drop

    out = stream_late_data_drop(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    kept = sum(r.n for r in out)
    assert 0 < kept < 0.2 * total, f"kept {kept} of {total} — no drop happened"
    tmax = ev.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    wm = tmax - datetime.timedelta(hours=36)
    cutoff = tmax - datetime.timedelta(hours=30)
    for r in out:
        w_end = r.window_start + datetime.timedelta(hours=6)
        assert w_end > wm, f"window ending {w_end} predates the watermark {wm}"
    # and at least one surviving window contains LATE contributions
    # (window straddling the cutoff counts rows from both batches)
    late_windows = [r for r in out if r.window_start < cutoff]
    assert late_windows, "no late contribution survived — boundary too coarse"
