"""Streaming event pipeline: watermarked windows + stateful operators.

The reference has no streaming path (SURVEY.md §1.1: every run is a
one-shot batch CLI). This module is the north-star extension: the same
windowed aggregations the batch workload runs over ``events`` expressed as
Structured Streaming, so a Delta/Kafka/file feed gets identical semantics
with late-data handling.

Scale posture:
- Watermarks bound state: windows older than ``watermark`` are finalized
  and evicted, so state size is O(active windows × keys), independent of
  total stream length.
- Aggregations are keyed shuffles with partial aggregation map-side —
  identical physical shape to the batch plan at any cluster size.
- The file source processes ``maxFilesPerTrigger`` at a time; on a real
  feed the trigger controls micro-batch sizing, not this module.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from delta_unity_duckdb_spark.sources.tables import _ensure_session_confs
from delta_unity_duckdb_spark.functions.frames import CKPT_DESER


def stream_scratch_dir(prefix: str) -> str:
    """Allocate a feed/stage/checkpoint directory for a streaming run.

    Defaults to the process temp dir (single-host). On a MULTI-HOST
    cluster the checkpoint location is written by the EXECUTORS' state
    stores and the staged feed dirs are listed by the driver but read
    by executors, so both must live on storage every node sees — set
    ``SPARK_GRAFT_STREAM_DIR`` to a shared path (NFS mount, fuse-mounted
    object store, DBFS) and every streaming entry point here relocates
    its scratch space there with no code change. tools/cluster_sim.py
    sets it to the cluster's shared workdir so the streaming twins run
    under the same contract a real deployment would use."""
    import tempfile

    root = os.environ.get("SPARK_GRAFT_STREAM_DIR") or None
    if root:
        os.makedirs(root, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=root)

# Explicit source schema (streaming readers cannot infer). ``ts`` physical
# encoding varies with the fixture writer — TIMESTAMP(NANOS) surfaces as
# int64 (nanosAsLong, see session.py), TIMESTAMP(MICROS/MILLIS) as a real
# timestamp — so the schema is derived from the file footer at bind time
# rather than hard-coded (a wrong unit silently lands every event in 1970).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events fixture directory.

    A parquet file dropped into a directory is exactly how micro-batch
    ingestion lands at scale; the same transformations bind unchanged to a
    Kafka or Delta source.
    """
    _ensure_session_confs(spark)
    # Footer-only batch inference tells us how this file's ``ts`` surfaces
    # in Spark's type system; the stream reader then binds the SAME schema,
    # so the conversion below is unit-correct for any fixture vintage.
    inferred = {
        f.name: f.dataType
        for f in spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    }
    raw_schema = StructType(
        [StructField(f.name, inferred.get(f.name, f.dataType)) for f in EVENTS_RAW_SCHEMA]
    )
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # The file source watches a DIRECTORY (new files appear → new batches);
    # the fixture is one file inside sf_dir, selected by glob.
    raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    # Watermarks require TIMESTAMP (not NTZ); session tz is pinned UTC so
    # the instant equals the batch path's wall-clock NTZ value.
    if isinstance(raw_schema["ts"].dataType, LongType):
        # int64 nanos → micros → timestamp
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp")
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window event counts with a watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window counts; each event lands in width/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows (gap-based) per user — state evicted at watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value sum, carried in explicit GroupState across
    micro-batches. The built-in windows can't express 'totals so far,
    updated every batch' — this is the engine's escape hatch for arbitrary
    per-key online state (SURVEY.md §7.6).

    Arrow-batched per group; state is a single (count, sum) tuple per user,
    so state size is O(distinct users)."""
    import pandas as pd  # local import: executors ship their own copy
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str | None = None,
    output_mode: str = "complete",
    progress_out: list | None = None,
) -> DataFrame:
    """Drain all available input in one go (Trigger.AvailableNow) into a
    memory sink and return the result as a batch DataFrame. The test /
    backfill harness for every streaming pipeline here: identical code
    path to a live run, bounded by current data.

    The throwaway checkpoint dir is removed once the query terminates
    (the memory-sink table lives in the session, not on disk), so
    repeated bench iterations don't accumulate /tmp state. Pass
    ``progress_out`` to receive ``q.recentProgress`` — callers that
    depend on version-specific micro-batch semantics (watermark drop
    timing) can assert on the observed metrics instead of trusting them.
    """
    name = query_name or f"q_{uuid.uuid4().hex[:8]}"
    ckpt = stream_scratch_dir(f"ckpt_{name}_")
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if progress_out is not None:
            progress_out.extend(q.recentProgress)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(name)


def stream_to_parquet(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """foreachBatch parquet sink: exactly-once per micro-batch via the
    checkpoint; the batch_id makes idempotent overwrite-by-batch possible
    on real object storage."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(target_dir)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_events_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup (E1's streaming arm): drop re-deliveries of
    the same event id within the watermark horizon. State holds one entry
    per key and is evicted once the watermark passes — bounded memory on
    an unbounded stream, the property batch dropDuplicates can't give."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys + ["ts"] if "ts" not in keys else keys
    )


def scd2_stream_sync(
    change_stream: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str = "batch_ts",
) -> DataFrame:
    """Streaming SCD Type 2 sync: apply the flagship merge
    (operators/scd2.py, reference delta_to_postgres_scd.py:177-267) to
    every micro-batch of a change-feed stream via ``foreachBatch``, and
    return the final dimension state.

    This is the lakehouse CDC pattern the reference approximates with
    repeated one-shot runs: each micro-batch closes changed current rows
    and inserts new versions, so the dimension is always queryable and
    versions accumulate in arrival order. ``ts_col`` carries each batch's
    effective timestamp (constant within a batch).

    Scale posture: state lives as a DataFrame re-merged per batch (on a
    cluster: a Delta table MERGE — same operator, durable target);
    ``localCheckpoint`` truncates lineage so batch N does not replay
    1..N-1. foreachBatch gives exactly-once per batch through the stream
    checkpoint; scd2_apply itself shuffles once on the business keys.
    """
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators.scd2 import scd2_apply

    holder: dict[str, DataFrame | None] = {"state": None}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ts = batch_df.agg(F.max(ts_col)).collect()[0][0]
        src = batch_df.drop(ts_col)
        new_state = scd2_apply(
            holder["state"], src, keys, tracked, F.lit(ts).cast("timestamp")
        )
        holder["state"] = new_state.localCheckpoint(eager=True, storageLevel=CKPT_DESER)

    ckpt = stream_scratch_dir("ckpt_scd2_stream_")
    q = (
        change_stream.writeStream.foreachBatch(apply_batch)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert holder["state"] is not None, "change stream produced no batches"
    return holder["state"]


def read_events_stream_from_dir(
    spark: SparkSession,
    feed_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a STAGED feed directory: one parquet file
    per micro-batch (``maxFilesPerTrigger=1``), batch order pinned by the
    files' mtimes — the harness for replay scenarios that need controlled
    batch boundaries (late-data drops, incremental index updates)."""
    _ensure_session_confs(spark)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )
