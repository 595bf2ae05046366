"""Fixture/table loading (maps reference Delta scan, delta-unity-duckdb.js:330).

The reference reads tables via ``delta_scan('<path>')``; the Spark-native
source is ``spark.read.format("delta").load(path)`` when delta-spark is
present, else ``spark.read.parquet``. The driver fixtures are one Parquet
file per table (TESTDATA.md).

Scale posture: schema-on-read from the footer/log only (no data scan);
column pruning and predicate pushdown flow from whatever the caller
selects/filters — nothing here forces materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should broadcast in joins at any scale.
BROADCAST_TABLES = frozenset({"region", "nation"})


def _ensure_session_confs(spark: SparkSession) -> None:
    """The engine may run inside a caller-owned SparkSession (e.g. the
    driver harness); these runtime-settable SQL confs are required for
    correct reads and engine-portable timestamps, so set them defensively."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — proceed with session defaults


# Resolved-relation cache, keyed per SparkSession. A real engine's catalog
# resolves a table name to a relation once and reuses it; without this,
# every query pays file listing + parquet footer schema inference again
# (~50-150ms per table reference — pure per-query latency, no effect on
# executed plans: downstream operators still build fresh lineage).
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> str:
    try:
        return spark.sparkContext.applicationId
    except Exception:
        return str(id(spark))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Delta directory > parquet file > parquet dir."""
    key = (_session_key(spark), os.path.abspath(sf_dir), name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    _RELATION_CACHE[key] = df
    return df


def load_table_cpu_bound(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` + a parallelism-floor guard for CPU-heavy consumers.

    Parquet scans parallelize at row-group granularity: a file written as
    ONE giant row group executes as ONE task no matter how many byte-range
    splits the planner makes, so a CPU-bound aggregate (wide DECIMAL sums,
    regex, portable-hash) over it runs single-threaded. When the footer
    shows such a degenerate layout (row groups ≪ cores) AND the table is
    big enough for a redistribution to pay for itself, round-robin
    repartition right after the scan. On well-laid-out tables — any real
    lakehouse table, where 100 TB is thousands of row groups — the guard
    is a no-op and the scan stays shuffle-free, which is why callers with
    prunable filters should keep using plain ``load_table`` (a repartition
    above the scan would block predicate pushdown).
    """
    df = load_table(spark, sf_dir, name)
    try:
        import pyarrow.parquet as pa_pq

        pq_path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(pq_path):
            return df
        meta = pa_pq.ParquetFile(pq_path).metadata
        cores = spark.sparkContext.defaultParallelism
        total = sum(
            meta.row_group(i).total_byte_size for i in range(meta.num_row_groups)
        )
        if meta.num_row_groups * 2 < cores and total > 4 * 1024 * 1024:
            return df.repartition(cores)
    except Exception:
        pass
    return df


def column_nonnull_by_stats(sf_dir: str, name: str, col: str) -> bool:
    """Footer null-count pruning: True iff every row group's parquet
    statistics prove ``col`` carries zero NULLs — the metadata move
    single-node engines (DuckDB, Trino) use to answer ``COUNT(col)``
    without decoding the column. At 600 M rows, skipping one int64
    column's decode is ~1 s of the hot-key aggregate's wall (measured
    sf100-skew); at 100 TB it is an entire column scan. Returns False
    whenever the proof is unavailable (delta/table directory instead of
    a plain parquet file, absent statistics, any error) — the caller
    must then fall back to actually counting the column."""
    try:
        import pyarrow.parquet as pa_pq

        pq_path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.isfile(pq_path):
            return False
        meta = pa_pq.ParquetFile(pq_path).metadata
        idx = {
            meta.schema.column(j).path: j for j in range(meta.num_columns)
        }.get(col)
        if idx is None:
            return False
        for i in range(meta.num_row_groups):
            st = meta.row_group(i).column(idx).statistics
            if st is None or not st.has_null_count or st.null_count:
                return False
        return True
    except Exception:
        return False


def _read_delta_any(spark: SparkSession, path: str) -> DataFrame:
    """Delta read that works with OR without delta-spark: prefer the full
    connector when its extension is loaded, else replay the transaction
    log directly (sources/delta_log.py — the reference's delta_scan move,
    delta-unity-duckdb.js:330)."""
    try:
        return spark.read.format("delta").load(path)
    except Exception:
        from delta_unity_duckdb_spark.sources.delta_log import read_delta

        return read_delta(spark, path)


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    delta_dir = os.path.join(sf_dir, name)
    if os.path.isdir(os.path.join(delta_dir, "_delta_log")):
        return _read_delta_any(spark, delta_dir)
    pq = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(pq if os.path.exists(pq) else delta_dir)
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) read as int64 (see session
        # config); truncate to micros exactly like a ns→µs timestamp cast.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_any(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Read a data file/directory by format (reference passthrough surface:
    DuckDB's read_parquet/read_csv/read_json reachable through $TABLE SQL,
    SURVEY.md §2-C scans). Format inferred from the extension when not
    given; CSV gets header+schema inference (sampling read — acceptable at
    setup time, not in a query path)."""
    _ensure_session_confs(spark)
    if fmt is None:
        low = path.lower().rstrip("/")
        if low.endswith((".csv", ".csv.gz")):
            fmt = "csv"
        elif low.endswith((".json", ".jsonl", ".ndjson", ".json.gz")):
            fmt = "json"
        elif low.endswith(".orc"):
            fmt = "orc"
        elif os.path.isdir(os.path.join(path, "_delta_log")):
            fmt = "delta"
        else:
            fmt = "parquet"
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "binaryFile":
        # Opaque-blob ingest (images/audio/video → multimodal operators):
        # (path, modificationTime, length, content binary), one row per file.
        return spark.read.format("binaryFile").load(path)
    if fmt == "delta":
        return _read_delta_any(spark, path)
    return spark.read.parquet(path)
