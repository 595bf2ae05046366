"""Mergeable streaming sketches: HyperLogLog, KMV/theta, Count-Min, Bloom.

At 100 TB, exact DISTINCT/top-k/membership over high-cardinality keys is a
full shuffle of every distinct value; sketches replace it with a
fixed-size, *mergeable* state that partial-aggregates map-side and unions
across partitions, days, or tables without rescanning history:

- **HyperLogLog** (``hll_sketch``): per-group register table
  ``(group…, reg, max_rho)`` — at most ``m = 2^p`` rows per group, built by
  ONE hash-aggregate with map-side combine (``MAX`` per register).
  ``hll_merge`` is register-wise ``MAX`` — associative/commutative/
  idempotent, so daily sketches roll up to monthly ones for free.
- **KMV / theta sketch** (``kmv_sketch``): the ``k`` smallest portable
  hashes per group; distinct ≈ ``(k-1)·2^60 / kth_min``. Merge = union
  the hash sets, keep the k smallest. Unlike HLL it supports set
  EXPRESSIONS (union/intersection estimates) on the kept hashes.
- **Count-Min** (``cms_counters``): ``depth × width`` counter matrix for
  frequency estimates / heavy hitters; merge = element-wise ``SUM``.
- **Bloom filter** (``bloom_build``/``bloom_probe``): k-hash membership
  positions for join pre-filtering — the manual analogue of the runtime
  bloom-pruned joins AQE injects, usable across jobs.

Everything hashes with the md5-derived portable hash
(functions/hashing.py), so every sketch — and therefore every estimate —
is ENGINE-EXACT: the DuckDB ``*_sql`` twins replay the identical
registers/minima/counters bit-for-bit, giving these approximate operators
full value-level oracles instead of tolerance checks. Floating-point
estimates are produced by a single division of exact integers (IEEE-
deterministic); the only libm call (``LN`` in HLL's small-range
correction) is rounded to 2 decimals on both engines.

Reference parity note: the reference delegates DISTINCT/aggregation
wholesale to DuckDB (delta-unity-duckdb.js:327-339 passthrough); sketches
are north-star scale extensions in the spirit of SURVEY.md §2-E.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.hashing import (
    HASH31_MOD,
    hash31,
    hash31_sql,
    hash60,
    hash60_sql,
)

HASH60_MAX = float(1 << 60)
# Pairwise-independent hash family (a*h31 + b) % P % width; P = 2^31 - 1
# (Mersenne prime). a*h31 < 2^35 — no 64-bit overflow.
_CMS_A = (3, 5, 7, 11)
_CMS_B = (17, 29, 43, 61)
_BLOOM_A = (3, 5, 7, 11, 13, 19, 23)
_BLOOM_B = (17, 29, 43, 61, 71, 89, 101)
_P = HASH31_MOD - 1  # 2^31 - 1


def _hll_consts(p: int) -> tuple[int, int, int, float]:
    m = 1 << p
    w = 60 - p  # bits left after the register index is peeled off
    scale = w + 1  # max possible rho; 2^(scale-rho) stays integral
    alpha = 0.7213 / (1 + 1.079 / m)
    return m, w, scale, alpha


# --------------------------------------------------------------------- HLL
def hll_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """Register-form HLL sketch: (group…, reg, max_rho), ≤ 2^p rows/group.

    ONE hash-aggregate: partial MAX per (group, reg) collapses map-side,
    so the shuffle carries at most ``partitions × groups × m`` rows
    regardless of input size — the property that makes 100 TB distinct
    counting a narrow pipeline.
    """
    m, w, _, _ = _hll_consts(p)
    h = hash60(F.col(value_col).cast("string"))
    d = df.select(*group_cols, h.alias("_h"))
    rest = F.expr(f"_h DIV {m}")
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rest))
    )
    return (
        d.select(
            *group_cols,
            F.pmod(F.col("_h"), F.lit(m)).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union two sketches: register-wise MAX. Associative + idempotent —
    re-merging the same day's sketch is harmless."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(
    sketch: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """(group…, registers_used, hll_raw, hll_distinct).

    ``hll_raw`` is the pure harmonic-mean estimate — exact-integer sum
    ``S = Σ 2^(scale−rho)`` (empty registers contribute ``2^scale``)
    divided once, so it is bit-identical on any engine. ``hll_distinct``
    applies the standard small-range linear-counting correction
    (``m·ln(m/zeros)`` when E ≤ 2.5m and zeros > 0), rounded to 2
    decimals because ``LN`` is the one libm call in this module.
    """
    m, _, scale, alpha = _hll_consts(p)
    c_num = alpha * m * m * float(1 << scale)  # single Python-folded literal
    g = sketch.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"CAST(POW(2.0, {scale} - max_rho) AS BIGINT)")
        ).alias("_s_present"),
        F.count(F.lit(1)).alias("registers_used"),
    )
    zeros = F.lit(m) - F.col("registers_used")
    s_total = (
        F.col("_s_present") + zeros * F.lit(1 << scale)
    ).cast("double")
    raw = F.lit(c_num) / s_total
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")), 2),
    ).otherwise(F.round(raw, 2))
    return g.select(
        *group_cols,
        F.col("registers_used").cast("bigint").alias("registers_used"),
        raw.alias("hll_raw"),
        corrected.alias("hll_distinct"),
    )


def hll_sql(
    table: str, group_expr: str, value_expr: str, p: int = 6
) -> str:
    """DuckDB twin: replays the identical registers and estimate."""
    m, w, scale, alpha = _hll_consts(p)
    c_num = alpha * m * m * float(1 << scale)
    h = hash60_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
    WITH h AS (SELECT {group_expr} AS g, {h} AS _h FROM {table}),
    r AS (
      SELECT g, _h % {m} AS reg,
             CASE WHEN _h // {m} = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(_h // {m})) END AS rho
      FROM h),
    sk AS (SELECT g, reg, MAX(rho) AS max_rho FROM r GROUP BY g, reg),
    agg AS (
      SELECT g,
             CAST(SUM(CAST(POW(2.0, {scale} - max_rho) AS BIGINT)) AS BIGINT)
               AS s_present,
             COUNT(*) AS n_present
      FROM sk GROUP BY g),
    est AS (
      SELECT g, n_present,
             CAST({c_num!r} AS DOUBLE)
               / CAST(s_present + ({m} - n_present) * CAST({1 << scale} AS BIGINT)
                      AS DOUBLE) AS raw
      FROM agg)
    SELECT g, CAST(n_present AS BIGINT) AS registers_used, raw AS hll_raw,
           CASE WHEN raw <= {2.5 * m!r} AND n_present < {m}
                THEN ROUND({float(m)!r} * LN({float(m)!r} / CAST({m} - n_present AS DOUBLE)), 2)
                ELSE ROUND(raw, 2) END AS hll_distinct
    FROM est
    """


# --------------------------------------------------------------------- KMV
def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    salt: int = 64,
) -> DataFrame:
    """k smallest distinct portable hashes per group: (group…, h, rn).

    Two-stage k-min so a low-cardinality (or global) group never funnels
    every distinct hash through one task: stage 1 takes the k smallest
    within each of ``salt`` hash buckets (the k global minima are a
    subset of the bucket-local minima), stage 2 ranks the ≤ salt×k
    survivors per group. Duplicate hashes collapse in a map-side partial
    aggregate before either stage, and the result is identical to a
    direct global rank — the salt only bounds per-task state.
    """
    h = hash60(F.col(value_col).cast("string"))
    distinct_h = (
        df.select(*group_cols, h.alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )
    w1 = Window.partitionBy(
        *[F.col(c) for c in group_cols], F.pmod(F.col("h"), F.lit(salt))
    ).orderBy("h")
    stage1 = distinct_h.select(
        *group_cols, "h", F.row_number().over(w1).alias("_rn1")
    ).filter(F.col("_rn1") <= k)
    w2 = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return stage1.select(
        *group_cols, "h", F.row_number().over(w2).alias("rn")
    ).filter(F.col("rn") <= k)


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Union two KMV sketches: union hash sets, keep the k smallest."""
    u = (
        a.select(*group_cols, "h")
        .unionByName(b.select(*group_cols, "h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return u.select(
        *group_cols, "h", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """(group…, n_kept, kth_min, kmv_distinct). Groups with fewer than k
    distinct hashes are exact (estimate = n_kept)."""
    g = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_min")
    )
    c_num = float(k - 1) * HASH60_MAX  # exact: (k-1) has few mantissa bits
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(c_num) / F.col("kth_min").cast("double")
    )
    return g.select(
        *group_cols,
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("kth_min").cast("bigint").alias("kth_min"),
        F.round(est, 2).alias("kmv_distinct"),
    )


def kmv_sql(
    table: str, group_expr: str, value_expr: str, k: int = 64
) -> str:
    h = hash60_sql(f"CAST({value_expr} AS VARCHAR)")
    c_num = float(k - 1) * HASH60_MAX
    return f"""
    WITH dh AS (SELECT DISTINCT {group_expr} AS g, {h} AS h FROM {table}),
    rk AS (SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
           FROM dh),
    sk AS (SELECT g, h FROM rk WHERE rn <= {k}),
    agg AS (SELECT g, COUNT(*) AS n_kept, MAX(h) AS kth_min FROM sk GROUP BY g)
    SELECT g, CAST(n_kept AS BIGINT) AS n_kept,
           CAST(kth_min AS BIGINT) AS kth_min,
           ROUND(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                      ELSE CAST({c_num!r} AS DOUBLE) / CAST(kth_min AS DOUBLE)
                 END, 2) AS kmv_distinct
    FROM agg
    """


# --------------------------------------------------------------- Count-Min
def cms_counters(
    counts: DataFrame,
    key_col: str,
    n_col: str,
    width: int = 1024,
) -> DataFrame:
    """depth×width counter matrix (row_i, pos, cnt) from per-key counts.

    Input is the keyed count table (already partially aggregated), so the
    explode factor is depth × distinct-keys, not depth × rows. Merge two
    sketches by unioning and SUMming per (row_i, pos).
    """
    h = hash31(F.col(key_col).cast("string"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (
                    (F.lit(a) * h + F.lit(b)) % F.lit(_P) % F.lit(width)
                ).alias("pos"),
            )
            for i, (a, b) in enumerate(zip(_CMS_A, _CMS_B))
        ]
    )
    return (
        counts.select(F.col(n_col).alias("_n"), F.explode(rows).alias("rp"))
        .groupBy(F.col("rp.row_i").alias("row_i"), F.col("rp.pos").alias("pos"))
        .agg(F.sum("_n").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame, probes: DataFrame, key_col: str, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each probe key: estimate = MIN over the
    depth rows of the addressed counters (classic CMS upper bound).
    ``counters`` is ≤ depth×width rows — broadcast side of the join."""
    h = hash31(F.col(key_col).cast("string"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (
                    (F.lit(a) * h + F.lit(b)) % F.lit(_P) % F.lit(width)
                ).alias("pos"),
            )
            for i, (a, b) in enumerate(zip(_CMS_A, _CMS_B))
        ]
    )
    addressed = probes.select(
        key_col, F.explode(rows).alias("rp")
    ).select(key_col, F.col("rp.row_i").alias("row_i"), F.col("rp.pos").alias("pos"))
    # LEFT join + COALESCE(cnt, 0): a probe key whose addressed slot holds
    # no counter row must estimate 0 (an inner join would silently drop it,
    # or take the MIN over fewer than depth rows — wrong for unseen keys).
    return (
        addressed.join(F.broadcast(counters), ["row_i", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_est"))
    )


def _positions_union_sql(
    src: str,
    key_expr: str,
    carry: str,
    a_consts: tuple[int, ...],
    b_consts: tuple[int, ...],
    width: int,
) -> str:
    """DuckDB fragment: one row per (carry…, row_i, pos) hash slot, as a
    UNION ALL over the hash-family constants — identical arithmetic to
    the Spark side's struct-array explode."""
    h = hash31_sql(f"CAST({key_expr} AS VARCHAR)")
    parts = [
        f"SELECT {carry}, {i} AS row_i, "
        f"(({a} * {h} + {b}) % {_P}) % {width} AS pos FROM {src}"
        for i, (a, b) in enumerate(zip(a_consts, b_consts))
    ]
    return " UNION ALL ".join(parts)


def cms_positions_sql(
    src: str, key_expr: str, carry: str, width: int = 1024
) -> str:
    return _positions_union_sql(src, key_expr, carry, _CMS_A, _CMS_B, width)


# ------------------------------------------------------------------- Bloom
def bloom_build(
    keys: DataFrame, key_col: str, m: int = 1 << 16
) -> DataFrame:
    """Build-side of a bloom join: the DISTINCT set bit positions of the
    key set under k=7 hashes — ≤ m rows however large the build side."""
    h = hash31(F.col(key_col).cast("string"))
    pos = F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(_P) % F.lit(m))
            for a, b in zip(_BLOOM_A, _BLOOM_B)
        ]
    )
    return (
        keys.select(F.explode(pos).alias("pos")).distinct()
    )


def bloom_probe(
    probe: DataFrame, positions: DataFrame, key_col: str, m: int = 1 << 16
) -> DataFrame:
    """Keys of ``probe`` whose k positions are ALL set: candidate matches
    (no false negatives). ``positions`` is ≤ m rows — broadcast."""
    k = len(_BLOOM_A)
    h = hash31(F.col(key_col).cast("string"))
    pos = F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(_P) % F.lit(m))
            for a, b in zip(_BLOOM_A, _BLOOM_B)
        ]
    )
    exploded = probe.select(key_col).distinct().select(
        key_col, F.explode(pos).alias("pos")
    )
    return (
        exploded.join(F.broadcast(positions), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k)
        .select(key_col)
    )


def bloom_positions_sql(
    src: str, key_expr: str, carry: str, m: int = 1 << 16
) -> str:
    return _positions_union_sql(src, key_expr, carry, _BLOOM_A, _BLOOM_B, m)


# -------------------------------------------------------------- histogram
def hist_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Fixed-boundary histogram sketch: (group…, bin, cnt), ≤ bins+2 rows
    per group (two overflow bins). The mergeable quantile structure —
    merge = counter SUM per (group, bin) — so per-day histograms roll up
    to any range without revisiting raw values, which GK/KLL-style
    order-dependent sketches cannot do deterministically. Accuracy is
    bounded by bin width rather than rank error: the right trade when the
    value domain is known (prices, latencies, scores)."""
    width = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    b = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(bins))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)))
        .cast("long")
    )
    return (
        # NULL values have no bin: without the filter they form a NULL
        # bin whose position in the cumulative ORDER BY bin differs per
        # engine (Spark sorts NULL first, DuckDB last), silently shifting
        # every quantile's rank (adversarial-values sweep, round 8)
        df.filter(v.isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """(group…, q, n, est): interpolated quantile estimates from the
    histogram. rank = floor(q·(n−1)); the estimate places the rank
    uniformly inside its bin. All arithmetic is a fixed sequence of IEEE
    ops over exact integers, so estimates are engine-exact."""
    width = (hi - lo) / bins
    w_cum = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*[F.col(c) for c in group_cols])
    c = sketch.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    from delta_unity_duckdb_spark.functions.frames import local_rows_df

    qdf = c.crossJoin(
        F.broadcast(
            local_rows_df(c.sparkSession, [(q,) for q in qs], "q double")
        )
    )
    rnk = F.floor(F.col("q") * (F.col("n") - 1).cast("double")).cast("long")
    sel = qdf.withColumn("rnk", rnk).filter(
        (F.col("rnk") >= F.col("cum") - F.col("cnt"))
        & (F.col("rnk") < F.col("cum"))
    )
    est = F.lit(lo) + F.lit(width) * (
        F.col("bin").cast("double")
        + (
            (F.col("rnk") - (F.col("cum") - F.col("cnt"))).cast("double")
            + F.lit(0.5)
        )
        / F.col("cnt").cast("double")
    )
    return sel.select(
        *group_cols,
        "q",
        F.col("n").cast("bigint").alias("n"),
        est.alias("est"),
    )


def hist_quantiles_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int,
) -> str:
    width = (hi - lo) / bins
    qlist = ", ".join(repr(q) for q in qs)
    return f"""
    WITH h AS (
      SELECT {group_expr} AS g,
             CASE WHEN CAST({value_expr} AS DOUBLE) < {lo!r} THEN -1
                  WHEN CAST({value_expr} AS DOUBLE) >= {hi!r} THEN {bins}
                  ELSE CAST(FLOOR((CAST({value_expr} AS DOUBLE) - {lo!r})
                                  / {width!r}) AS BIGINT) END AS bin
      FROM {table} WHERE {value_expr} IS NOT NULL),
    sk AS (SELECT g, bin, COUNT(*) AS cnt FROM h GROUP BY g, bin),
    c AS (
      SELECT g, bin, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM sk),
    sel AS (
      SELECT c.*, qq.q,
             CAST(FLOOR(qq.q * CAST(c.n - 1 AS DOUBLE)) AS BIGINT) AS rnk
      FROM c CROSS JOIN (SELECT unnest([{qlist}]) AS q) qq)
    SELECT g, q, n,
           {lo!r} + {width!r} * (CAST(bin AS DOUBLE)
             + (CAST(rnk - (cum - cnt) AS DOUBLE) + 0.5)
               / CAST(cnt AS DOUBLE)) AS est
    FROM sel
    WHERE rnk >= cum - cnt AND rnk < cum
    """
