"""Event-time window queries over the stream-shaped ``events`` table
(SURVEY.md §2-E7). Batch semantics here; the same plans run as Structured
Streaming with ``withWatermark`` (streaming/ module) — window semantics are
identical, which is the point of testing them in batch against an oracle.

Oracle note: ``events.ts`` is nanosecond-precision parquet; Spark truncates
to microseconds on read, so every oracle casts ts to TIMESTAMP (µs) first.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.numeric import dec
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query
from delta_unity_duckdb_spark.functions.frames import CKPT_DESER


# ---------------------------------------------------------------- tumbling
@query(
    "tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
)
def tumbling_window(spark, sf_dir):
    """5-minute tumbling windows per event type — partial agg before the
    (window, type) shuffle; identical plan under Structured Streaming.
    The exact decimal sum runs in fixed-point (fx_sums) — the round-8
    high-cardinality sweep measured the per-row BigDecimal CAST+SUM as
    the window family's dominant cost (same finding as
    salted_hot_key_agg, relational.py)."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    e = load_table(spark, sf_dir, "events")
    bucketed = e.select(
        F.window("ts", "5 minutes")["start"].alias("window_start"),
        "event_type",
        "value",
    )
    return fx_sums(
        bucketed,
        ["window_start", "event_type"],
        {"sv": (F.expr("CAST(value * 10000 + 0.5d AS BIGINT)"), 4)},
        extras={"n": F.count(F.lit(1))},
        bounds={"sv": (0, 100_000_000)},
    ).select(
        "window_start",
        "event_type",
        "n",
        F.col("sv").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------- sliding
@query(
    "sliding_window",
    oracle="""
    WITH phased AS (
      SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start, value
      FROM events WHERE ts IS NOT NULL
      UNION ALL
      SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP), INTERVAL '5 minutes') AS window_start, value
      FROM events WHERE ts IS NOT NULL
    )
    SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM phased GROUP BY 1
    """,
)
def sliding_window(spark, sf_dir):
    """10-minute windows sliding by 5 — each event lands in 2 windows; the
    oracle reproduces this as two phase-shifted tumbling bucketings.
    Decimal sums in fixed-point (fx_sums — see tumbling_window).

    Round-8 rework: ``F.window(ts, 10m, 5m)`` plans a Generate that
    DOUBLES the raw rows before the partial aggregate — 200 M expanded
    rows through the fixed-point sums. The slide divides the width, so
    the hypertable_rollup trick applies: aggregate ONCE at the 5-minute
    grain (~10⁴ rows), then each fine bucket feeds exactly the two
    sliding windows starting at ``b`` and ``b − 5min`` — explode on the
    TINY aggregate, re-sum the exact decimals. Value-identical to the
    direct window by associativity; the raw scan now does the same work
    as tumbling_window."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    e = load_table(spark, sf_dir, "events")
    fine = fx_sums(
        e.select(
            F.window("ts", "5 minutes")["start"].alias("b5"),
            "value",
        ),
        ["b5"],
        {"sv": (F.expr("CAST(value * 10000 + 0.5d AS BIGINT)"), 4)},
        extras={"n": F.count(F.lit(1))},
        bounds={"sv": (0, 100_000_000)},
    )
    return (
        fine.select(
            F.explode(
                F.array(
                    F.col("b5"),
                    F.col("b5") - F.expr("INTERVAL 5 MINUTES"),
                )
            ).alias("window_start"),
            "n",
            "sv",
        )
        .groupBy("window_start")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sv").alias("sv"),
        )
        .select(
            "window_start", "n", F.col("sv").cast("double").alias("sum_value")
        )
    )


# ---------------------------------------------------------------- session windows
@query(
    "session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       >= INTERVAL '5 minutes'
                  OR LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM marked)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_no
    """,
)
def session_window(spark, sf_dir):
    """Per-user sessionization with a 5-minute gap (F.session_window in
    batch; gaps-and-islands SQL as the oracle). Spark merges events whose
    ts is strictly inside [last_ts, last_ts + gap)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(dec("value")).cast("double").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------- sessionization via lag (window-function form)
@query(
    "event_funnel",
    oracle="""
    SELECT event_type, next_type, COUNT(*) AS n FROM (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      FROM events WHERE ts IS NOT NULL) t
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def event_funnel(spark, sf_dir):
    """Event-transition matrix (funnel analysis): lead() per user, then a
    pair count — one keyed shuffle for the window, partial agg after."""
    # NULL-ts events have no position in a user's event sequence —
    # excluded on BOTH sides (oracle WHERE ts IS NOT NULL); without the
    # filter Spark orders NULL first and DuckDB last (adversarial-ts
    # sweep, round 8)
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------- as-of join
@query(
    "asof_join_events",
    oracle="""
    SELECT p.user_id,
           CAST(p.ts AS TIMESTAMP) AS ts,
           p.event_id,
           p.value,
           v.event_id AS view_event_id,
           CAST(v.ts AS TIMESTAMP) AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL) p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view' AND ts IS NOT NULL) v
      ON p.user_id = v.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
    """,
)
def asof_join_events(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent view at
    or before it (attribution shape). Implemented union+LOCF — one keyed
    shuffle, no range-join explosion (operators/asof.py); oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from delta_unity_duckdb_spark.operators.asof import asof_join

    # NULL-ts rows excluded on both sides (no as-of position)
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    v = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    return asof_join(
        p,
        v,
        on=["user_id"],
        ts_col="ts",
        right_cols={"event_id": "view_event_id", "ts": "view_ts"},
        right_id_col="event_id",
    )


# ---------------------------------------------------------------- hypertable rollup
@query(
    "hypertable_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket_5m,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events WHERE ts IS NOT NULL
    GROUP BY GROUPING SETS ((1), (1, 2), (1, 2, 3))
    """,
)
def hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: one pass producing
    day, day+hour, and day+hour+5-minute aggregates.

    Round-8 rework (found by the high-cardinality sf100 sweep): the
    ROLLUP form plans an Expand that quadruples the raw rows BEFORE the
    partial aggregate — 400 M expanded rows each paying the per-row
    BigDecimal CAST+SUM, measured 10.2 s vs DuckDB 0.7 s. The rollup of
    a time HIERARCHY needs none of that: aggregate ONCE at the finest
    granularity (≈10⁴ buckets — this is also the natural incremental-
    materialization unit), keep the 5-minute sums in exact fixed-point
    decimal (fx_sums, bounds-guarded), and derive the hour and day
    levels by re-aggregating the tiny fine aggregate — decimal re-sums
    are exact, so every level is bit-identical to summing the raw rows.
    The raw scan now runs the codegen long-word path and each coarser
    level costs ~10⁴ rows instead of a second pass."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    e = load_table(spark, sf_dir, "events")
    # ONE per-row temporal function: day and hour are functionally
    # determined by the 5-minute bucket (the hierarchy nests), so they
    # are derived on the ~10⁴ aggregate rows, not per raw row.
    bucketed = e.select(
        F.window("ts", "5 minutes")["start"].alias("bucket_5m"),
        "value",
    )
    fine = fx_sums(
        bucketed,
        ["bucket_5m"],
        # value is a nonnegative ≤4-decimal double (events generator);
        # v·10⁴ + 0.5 truncates to CAST(value AS DECIMAL(18,4))'s
        # unscaled long — same recipe as pricing_summary
        {"sv": (F.expr("CAST(value * 10000 + 0.5d AS BIGINT)"), 4)},
        extras={"n": F.count(F.lit(1))},
        bounds={"sv": (0, 100_000_000)},
    ).select(
        F.date_trunc("day", "bucket_5m").cast("date").alias("day"),
        F.date_trunc("hour", "bucket_5m").alias("hour"),
        "bucket_5m",
        "n",
        "sv",
        # checkpointed: the three union levels re-read the ~10⁴-row fine
        # aggregate — exactly one scan of the fact table by construction
        # (not by hoping AQE's exchange reuse fires)
    ).localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    # NULL level markers must match the fine frame's exact temporal types
    # (timestamp_ntz for the nanos-normalized fixture, timestamp for a
    # plain-typed one) or the union refuses to resolve.
    types = dict(fine.dtypes)
    lvl3 = fine.select("day", "hour", "bucket_5m", "n", F.col("sv").alias("s"))
    lvl2 = (
        fine.groupBy("day", "hour")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("s"))
        .select(
            "day",
            "hour",
            F.lit(None).cast(types["bucket_5m"]).alias("bucket_5m"),
            "n",
            "s",
        )
    )
    lvl1 = (
        fine.groupBy("day")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("s"))
        .select(
            "day",
            F.lit(None).cast(types["hour"]).alias("hour"),
            F.lit(None).cast(types["bucket_5m"]).alias("bucket_5m"),
            "n",
            "s",
        )
    )
    return (
        lvl3.unionByName(lvl2)
        .unionByName(lvl1)
        .select(
            "day",
            "hour",
            "bucket_5m",
            F.col("n").cast("bigint").alias("n"),
            F.col("s").cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------- gap-fill
@query(
    "timeseries_gapfill",
    oracle="""
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
    spine AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT UNNEST(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS bucket
                  FROM bounds) g)
    SELECT s.event_type, s.bucket,
           COALESCE(b.n, 0) AS n,
           last_value(b.sum_value IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.bucket) AS filled_value
    FROM spine s
    LEFT JOIN b ON s.event_type = b.event_type AND s.bucket = b.bucket
    """,
)
def timeseries_gapfill(spark, sf_dir):
    """Time-series gap filling with last-observation-carried-forward
    (timescale `time_bucket_gapfill`+`locf` semantics): aggregate to 5-min
    buckets, build the dense (event_type x bucket) spine with
    ``sequence``+``explode``, left-join, then LOCF via
    ``last(ignorenulls)`` over an event-type window. The spine is bounded
    by #types x #buckets — independent of row count, so at 100 TB the
    expensive part stays the one partial-agg shuffle over the raw events;
    the spine join and LOCF window act on the already-aggregated series."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    e = load_table(spark, sf_dir, "events")
    buckets = fx_sums(
        e.select(
            "event_type",
            F.window("ts", "5 minutes").getField("start").alias("bucket"),
            "value",
        ),
        ["event_type", "bucket"],
        # fixed-point exact decimal sum (see tumbling_window)
        {"sv": (F.expr("CAST(value * 10000 + 0.5d AS BIGINT)"), 4)},
        extras={"n": F.count(F.lit(1))},
        bounds={"sv": (0, 100_000_000)},
    ).select(
        "event_type", "bucket", "n", F.col("sv").cast("double").alias("sum_value")
    ).localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    # checkpointed: three consumers below (bounds, spine, the left join)
    # re-read the ~10⁴-row aggregate, never the 100 M-row scan
    bounds = buckets.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    spine = (
        buckets.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTES"))
            ).alias("bucket"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    return (
        spine.join(buckets, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


# ---------------------------------------------------------------- trailing EWMA
@query(
    "ewma_trailing",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL),
    l AS (
      SELECT user_id, event_id, ts,
             ROW_NUMBER() OVER w AS rn,
             cents AS c0,
             LAG(cents, 1) OVER w AS c1, LAG(cents, 2) OVER w AS c2,
             LAG(cents, 3) OVER w AS c3, LAG(cents, 4) OVER w AS c4,
             LAG(cents, 5) OVER w AS c5, LAG(cents, 6) OVER w AS c6,
             LAG(cents, 7) OVER w AS c7
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id,
           (c0*128 + c1*64 + c2*32 + c3*16 + c4*8 + c5*4 + c6*2 + c7) // 255
               AS ewma_cents
    FROM l WHERE rn >= 8 ORDER BY user_id, event_id LIMIT 500
    """,
)
def ewma_trailing(spark, sf_dir):
    """Per-user exponentially weighted moving average (α=1/2, truncated at
    8 lags) — the smoothing/anomaly-baseline op of a metrics pipeline. An
    exact infinite-horizon EWMA is order-sequential and float-unstable
    across engines; the trailing-8 truncation turns it into a FIXED linear
    combination with power-of-two weights (128/255 … 1/255), computed in
    integer cents (floor-quantized from the double, the repo's
    cross-engine rule) so both engines produce bit-identical results.

    Scale: ONE shuffle on user_id; all eight lags + row_number evaluate in
    a single window operator pass with O(8) state per row — no
    range-frame re-scans, no per-user sort beyond the window's own.
    Emitted only once the window is full (rn >= 8), matching a
    steady-state smoother.
    """
    # NULL-ts rows have no sequence position — excluded on both sides
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    c = e.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = c.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.col("cents").alias("c0"),
        *[F.lag("cents", j).over(w).alias(f"c{j}") for j in range(1, 8)],
    )
    # FLOOR division, not `div`: Spark's `div` truncates toward zero while
    # DuckDB's `//` floors, so they diverge whenever the weighted sum goes
    # negative (negative event amounts → negative cents). The identity
    # floor(a/b) = (a - pmod(a,b)) div b (b > 0) is exact int64 floor on
    # BOTH signs, keeping the formula engine-portable on any domain.
    s = "(c0*128 + c1*64 + c2*32 + c3*16 + c4*8 + c5*4 + c6*2 + c7)"
    return (
        lags.filter(F.col("rn") >= 8)
        .select(
            "user_id",
            "event_id",
            F.expr(f"({s} - pmod({s}, 255)) div 255").alias("ewma_cents"),
        )
        .orderBy("user_id", "event_id")
        .limit(500)
    )


# ---------------------------------------------------------------- set-similarity join
@query(
    "user_jaccard_pairs",
    oracle="""
    WITH uk AS (
      SELECT DISTINCT user_id, CAST(REGEXP_EXTRACT(props, '[0-9]+') AS BIGINT) AS k
      FROM events WHERE props IS NOT NULL),
    sizes AS (SELECT user_id, COUNT(*) AS n FROM uk GROUP BY user_id),
    inter AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS both_n
      FROM uk a JOIN uk b ON a.k = b.k AND a.user_id < b.user_id
      GROUP BY 1, 2)
    SELECT u1, u2, both_n,
           (both_n * 1000000) // (s1.n + s2.n - both_n) AS jaccard_ppm
    FROM inter JOIN sizes s1 ON u1 = s1.user_id JOIN sizes s2 ON u2 = s2.user_id
    ORDER BY jaccard_ppm DESC, u1, u2 LIMIT 50
    """,
)
def user_jaccard_pairs(spark, sf_dir):
    """Set-similarity join: top user pairs by Jaccard overlap of their
    event-property sets (behavioral cohort discovery; same shape as the
    top-k similarity-search literature in PAPERS.md). Jaccard lands as
    integer ppm (floor) for cross-engine exactness.

    TWO density regimes, picked by probing the element universe
    (round-4 rework; both value-identical to the oracle):

    - DENSE (universe ≤ 4096, the fixtures' K=100 / density ≈ 0.5):
      blocked incidence-matrix tiles (``dense_jaccard_pairs``). The
      co-occurrence join is the WRONG plan here — every pair overlaps,
      so it materializes ~density·K rows per pair (measured 26.6M
      intermediate rows for 1.1M pairs at sf0.1) and its "zero-overlap
      pairs never materialize" advantage is vacuous.
    - SPARSE (large universe): the co-occurrence equi-join on k — pairs
      are generated only through shared elements, so the overwhelming
      zero-overlap majority never materializes. Heavy-hitter elements
      (a k shared by millions of users) would be pre-split by the
      salting operators in operators/skew.py.
    """
    from delta_unity_duckdb_spark.operators.similarity import (
        dense_jaccard_pairs,
        jaccard_topk_pairs_dedup,
    )

    e = load_table(spark, sf_dir, "events")
    uk = (
        e.filter(F.col("props").isNotNull())
        .select(
            "user_id",
            F.regexp_extract("props", "[0-9]+", 0).cast("bigint").alias("k"),
        )
        .distinct()
        # checkpointed: the ladder probe, the operator's universe probe,
        # its user count, and the kernel pass all re-read the narrow
        # distinct frame — without this, each probe re-runs the regexp
        # scan + distinct shuffle (~0.9 s of pure constant at sf0.1)
        .localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    )
    # Regime ladder (each step falls through):
    # 1. SMALL user count -> dense tiles directly (one tile, no
    #    checkpoint overhead — the dedup machinery costs ~2s of eager
    #    materialization that small frames never earn back).
    # 2. large user count -> set-dedup-first (jaccard_topk_pairs_dedup):
    #    score the M DISTINCT k-sets, expand exactly — the plan that
    #    survives duplication-heavy data (plain sf100: 1.5M users,
    #    ~1.5k masks); returns None when masks ~ users (no duplication,
    #    e.g. the skewed fixture's random per-user subsets), where the
    #    packed dense tiles below are the inherently-quadratic exact
    #    fallback (Theta(U^2 K): ~2e14 FLOPs at 1.5M users — the
    #    registered LSH/minhash family is the production answer there).
    # 3. sparse co-occurrence join (large element universe).
    pairs = None
    n_users = uk.select("user_id").distinct().count()
    if n_users > 100_000:
        pairs = jaccard_topk_pairs_dedup(uk, top_k=50)
    if pairs is None:
        # top_k=50 pushes the query's final cut into the tile kernels:
        # each tile emits its local top-50 under the identical total
        # order, an exact superset of the global top-50 (see
        # dense_jaccard_pairs) — without it the operator's OUTPUT is
        # every overlapping pair (~10¹⁰ rows at 100× fixture scale).
        pairs = dense_jaccard_pairs(uk, top_k=50, n_users=n_users)
    if pairs is None:  # sparse regime: co-occurrence join
        sizes = uk.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        a, b = uk.alias("a"), uk.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.k") == F.col("b.k"))
                & (F.col("a.user_id") < F.col("b.user_id")),
            )
            .select(
                F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2")
            )
            .groupBy("u1", "u2")
            .agg(F.count(F.lit(1)).alias("both_n"))
        )
        s1 = sizes.select(F.col("user_id").alias("u1"), F.col("n").alias("n1"))
        s2 = sizes.select(F.col("user_id").alias("u2"), F.col("n").alias("n2"))
        # sizes is |users|-cardinality — no forced broadcast; AQE
        # broadcasts when it fits, shuffles on the pair keys otherwise.
        pairs = (
            inter.join(s1, "u1")
            .join(s2, "u2")
            .select(
                "u1",
                "u2",
                "both_n",
                F.expr("(both_n * 1000000) div (n1 + n2 - both_n)").alias(
                    "jaccard_ppm"
                ),
            )
        )
    return pairs.orderBy(F.desc("jaccard_ppm"), "u1", "u2").limit(50)


# ---------------------------------------------------------------- distribution drift
@query(
    "distribution_drift",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-11' THEN 0 ELSE 1 END AS half,
             LEAST(CAST(FLOOR(value / 5) AS BIGINT), 19) AS bucket
      FROM events),
    counts AS (
      SELECT event_type, bucket,
             COUNT(CASE WHEN half = 0 THEN 1 END) AS n_ref,
             COUNT(CASE WHEN half = 1 THEN 1 END) AS n_cur
      FROM b GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bucket,
             SUM(n_ref) OVER w AS cref, SUM(n_cur) OVER w AS ccur,
             SUM(n_ref) OVER t AS tref, SUM(n_cur) OVER t AS tcur
      FROM counts
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket),
             t AS (PARTITION BY event_type))
    SELECT event_type, CAST(MAX(tref) AS BIGINT) AS n_ref,
           CAST(MAX(tcur) AS BIGINT) AS n_cur,
           CAST(MAX(ABS((cref * 1000000) // tref - (ccur * 1000000) // tcur)) AS BIGINT) AS ks_ppm
    FROM cum GROUP BY event_type ORDER BY event_type
    """,
)
def distribution_drift(spark, sf_dir):
    """Distribution-drift detection (Kolmogorov–Smirnov statistic on a
    fixed bucket grid): per event type, the max gap between the empirical
    CDFs of ``value`` in a reference window (first 10 days) and the
    current window — the monitor a pipeline runs before trusting a new
    data drop against its training distribution. CDFs are integer-ppm
    ratios of cumulative bucket counts (floor), so the statistic is exact
    and engine-portable; the bucket grid is fixed (20 × width-5), so no
    data-dependent quantile step.

    Scale: one conditional-count aggregation collapses the raw events to
    (#types × 20) rows — everything after (cumulative windows, the max)
    runs on that tiny frame. The fact table is touched once, shuffled
    once.
    """
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-11").cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
        F.least(F.floor(F.col("value") / 5).cast("bigint"), F.lit(19)).alias(
            "bucket"
        ),
    )
    counts = b.groupBy("event_type", "bucket").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("half") == 1, 1)).alias("n_cur"),
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    t = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("n_ref").over(w).alias("cref"),
        F.sum("n_cur").over(w).alias("ccur"),
        F.sum("n_ref").over(t).alias("tref"),
        F.sum("n_cur").over(t).alias("tcur"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("tref").alias("n_ref"),
            F.max("tcur").alias("n_cur"),
            F.max(
                F.abs(
                    F.expr("(cref * 1000000) div tref")
                    - F.expr("(ccur * 1000000) div tcur")
                )
            ).alias("ks_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- equi-depth histogram
@query(
    "equi_depth_histogram",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, decile, COUNT(*) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM t GROUP BY 1, 2 ORDER BY event_type, decile
    """,
)
def equi_depth_histogram(spark, sf_dir):
    """Equi-depth (quantile-bucketed) histogram per event type — the
    feature-binning / CBO-statistics companion to the fixed-grid
    `histogram_bins`: every decile holds the same row count and the
    boundaries adapt to the data.

    Round-8 rework (found by the sf100 high-cardinality sweep): the
    NTILE window funnels each event type's 20 M rows through ONE task's
    sort — >200 s at sf100 where DuckDB's parallel sort takes 42 s. But
    the OUTPUT never needs per-row deciles: NTILE fixes each decile's
    row count from n alone (floor(n/10), +1 for the first n%10), and a
    decile's lo/hi are the VALUES at its boundary ranks — the event_id
    tie-break only orders rows WITHIN equal values, so it cannot change
    which value sits at any rank. So: aggregate to a per-(type, value)
    count histogram (one partial-agg shuffle, fully parallel), take the
    running count (a window over histogram rows, not raw rows), and
    join each decile's two boundary ranks into the value-run that
    contains them. Value-identical to the NTILE form on any input.

    Regime ladder: the histogram is #types × #distinct-values — tiny
    for quantized measures (the fixture's 2-decimal values: ≤56 k).
    A bounded probe falls back to the NTILE window when distinct values
    exceed 4 M (arbitrary-double data), where the histogram's own
    cumulative window would inherit the same serialization.
    """
    e = load_table(spark, sf_dir, "events").filter(
        # NULL values carry no rank: excluded on BOTH sides (oracle WHERE)
        # — with them in, Spark's NULLS-FIRST vs DuckDB's NULLS-LAST
        # window order lands them in OPPOSITE deciles and shifts every
        # boundary (adversarial-values sweep, round 8)
        F.col("value").isNotNull()
    )
    # ladder probe: one scan, no shuffle (HLL partial merge); the
    # threshold is a regime choice, so ±2% estimation error is fine
    n_distinct = e.agg(
        F.approx_count_distinct("value").alias("d")
    ).collect()[0]["d"]
    if n_distinct > 4_000_000:
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        return (
            e.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
            .groupBy("event_type", "decile")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("value").alias("lo"),
                F.max("value").alias("hi"),
            )
            .orderBy("event_type", "decile")
        )
    hist = e.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.partitionBy("event_type").orderBy("value")
    cum = hist.select(
        "event_type",
        "value",
        F.sum("cnt").over(wv).alias("c_end"),
        (F.sum("cnt").over(wv) - F.col("cnt")).alias("c_start"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n_tot"),
    ).localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    # decile spec: NTILE row counts are arithmetic in n — decile d spans
    # ranks (S_{d-1}, S_d] where the first n%10 deciles hold one extra
    deciles = (
        cum.select("event_type", "n_tot")
        .distinct()
        .select(
            "event_type",
            "n_tot",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        )
        .select(
            "event_type",
            "decile",
            F.expr(
                "(decile - 1) * (n_tot div 10)"
                " + least(CAST(decile - 1 AS BIGINT), n_tot % 10)"
            ).alias("r_start"),  # exclusive
            F.expr(
                "decile * (n_tot div 10)"
                " + least(CAST(decile AS BIGINT), n_tot % 10)"
            ).alias("r_end"),  # inclusive
        )
        .filter(F.col("r_end") > F.col("r_start"))  # n < 10: empty deciles
    )
    lo = deciles.alias("d").join(
        cum.alias("h"),
        # eqNullSafe: the NULL event_type GROUP is legitimate (only its
        # VALUES were filtered) and a plain equality would drop it
        F.col("d.event_type").eqNullSafe(F.col("h.event_type"))
        & (F.col("h.c_start") < F.col("d.r_start") + 1)
        & (F.col("d.r_start") + 1 <= F.col("h.c_end")),
    ).select(
        F.col("d.event_type").alias("event_type"),
        "d.decile",
        (F.col("d.r_end") - F.col("d.r_start")).alias("n"),
        F.col("h.value").alias("lo"),
    )
    hi = deciles.alias("d").join(
        cum.alias("h"),
        F.col("d.event_type").eqNullSafe(F.col("h.event_type"))
        & (F.col("h.c_start") < F.col("d.r_end"))
        & (F.col("d.r_end") <= F.col("h.c_end")),
    ).select(
        F.col("d.event_type").alias("event_type"),
        "d.decile",
        F.col("h.value").alias("hi"),
    )
    hi2 = hi.select(
        F.col("event_type").alias("h_event_type"),
        F.col("decile").alias("h_decile"),
        "hi",
    )
    return (
        # eqNullSafe again: a USING-join would silently drop the NULL
        # event_type group's rows
        lo.join(
            hi2,
            F.col("event_type").eqNullSafe(F.col("h_event_type"))
            & (F.col("decile") == F.col("h_decile")),
        )
        .select("event_type", "decile", "n", "lo", "hi")
        .orderBy("event_type", "decile")
    )
