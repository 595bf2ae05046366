"""Sketch workload queries — mergeable HLL / KMV / Count-Min / Bloom.

Every query here is an APPROXIMATE operator with an EXACT oracle: the
md5-portable hash (functions/hashing.py) makes the sketches engine-
deterministic, so the DuckDB twin replays the identical registers /
minima / counters and the driver's value-hash check verifies the whole
approximate pipeline, not just a tolerance band. Accuracy vs ground
truth is asserted separately in tests/test_sketches.py.

Scale rationale (100 TB): exact COUNT(DISTINCT) shuffles every distinct
value; these sketches shuffle a FIXED number of rows per group
(m registers / k minima / depth×width counters) with map-side combine,
and merge across days/partitions without rescanning history.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators import sketches as SK
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query

_HLL_P = 6
_KMV_K = 64
_CMS_W = 1024
_BLOOM_M = 1 << 16


# ----------------------------------------------------------------- HLL
@query(
    "hll_distinct_groups",
    oracle=f"""
    WITH per AS ({SK.hll_sql("lineitem", "l_returnflag", "l_partkey", _HLL_P)}),
    allg AS ({SK.hll_sql("lineitem", "'ALL'", "l_partkey", _HLL_P)})
    SELECT * FROM (SELECT * FROM per UNION ALL SELECT * FROM allg)
    ORDER BY g
    """,
)
def hll_distinct_groups(spark, sf_dir):
    """Distinct parts per return-flag via HyperLogLog registers, plus an
    'ALL' row produced by MERGING the per-group sketches (register-wise
    MAX) — the associativity that lets daily sketches roll up to monthly
    without rescanning. One hash-aggregate per level; the shuffle carries
    ≤ groups × 2^p rows regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")
    sk = SK.hll_sketch(li, ["l_returnflag"], "l_partkey", p=_HLL_P)
    per = SK.hll_estimate(sk, ["l_returnflag"], p=_HLL_P)
    merged = (
        sk.withColumn("l_returnflag", F.lit("ALL"))
        .groupBy("l_returnflag", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    allg = SK.hll_estimate(merged, ["l_returnflag"], p=_HLL_P)
    return (
        per.unionByName(allg)
        .withColumnRenamed("l_returnflag", "g")
        .orderBy("g")
    )


# ----------------------------------------------------------------- KMV
@query(
    "kmv_distinct_merge",
    oracle=f"""
    WITH per AS ({SK.kmv_sql("orders", "o_orderpriority", "o_custkey", _KMV_K)}),
    allg AS ({SK.kmv_sql("orders", "'ALL'", "o_custkey", _KMV_K)})
    SELECT * FROM (SELECT * FROM per UNION ALL SELECT * FROM allg)
    ORDER BY g
    """,
)
def kmv_distinct_merge(spark, sf_dir):
    """Distinct customers per order priority via KMV (k minimum hash
    values; theta-sketch family), plus a merged 'ALL' row: union the
    per-group hash sets and re-take the k smallest — exactly the sketch
    of the union. WindowGroupLimit pushes the rn<=k bound below the
    per-group sort, so the kept state is k rows per group."""
    o = load_table(spark, sf_dir, "orders")
    per_sk = SK.kmv_sketch(o, ["o_orderpriority"], "o_custkey", k=_KMV_K)
    per = SK.kmv_estimate(per_sk, ["o_orderpriority"], k=_KMV_K)
    all_sk = SK.kmv_sketch(
        o.withColumn("o_orderpriority", F.lit("ALL")),
        ["o_orderpriority"],
        "o_custkey",
        k=_KMV_K,
    )
    allg = SK.kmv_estimate(all_sk, ["o_orderpriority"], k=_KMV_K)
    return (
        per.unionByName(allg)
        .withColumnRenamed("o_orderpriority", "g")
        .orderBy("g")
    )


# ------------------------------------------------------------- Count-Min
_CMS_TOKS = """
    toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
    tc AS (
      SELECT word, COUNT(*) AS n FROM toks WHERE word <> '' GROUP BY word)
"""


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH {_CMS_TOKS},
    pos AS ({SK.cms_positions_sql("tc", "word", "word, n", _CMS_W)}),
    counters AS (
      SELECT row_i, pos, CAST(SUM(n) AS BIGINT) AS cnt
      FROM pos GROUP BY row_i, pos),
    top AS (SELECT word, n FROM tc ORDER BY n DESC, word LIMIT 20),
    tpos AS ({SK.cms_positions_sql("top", "word", "word, n", _CMS_W)}),
    est AS (
      SELECT t.word, MIN(c.cnt) AS cms_est
      FROM tpos t JOIN counters c ON t.row_i = c.row_i AND t.pos = c.pos
      GROUP BY t.word)
    SELECT top.word AS word, CAST(top.n AS BIGINT) AS true_n,
           CAST(est.cms_est AS BIGINT) AS cms_est
    FROM top JOIN est ON top.word = est.word
    ORDER BY true_n DESC, top.word
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Heavy-hitter tokens through a 4×1024 Count-Min sketch: build the
    counter matrix from the token counts (explode factor = depth ×
    distinct tokens, not depth × rows), then point-query the top-20 true
    tokens — cms_est ≥ true_n always (one-sided error), equality when no
    counter collision. Counters (≤ 4096 rows) broadcast to the probe."""
    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counters = SK.cms_counters(tc, "word", "n", width=_CMS_W)
    top = tc.orderBy(F.desc("n"), "word").limit(20)
    est = SK.cms_estimate(counters, top.select("word"), "word", width=_CMS_W)
    return (
        top.join(est, "word")
        .select(
            "word",
            F.col("n").cast("bigint").alias("true_n"),
            F.col("cms_est"),
        )
        .orderBy(F.desc("true_n"), "word")
    )


# ----------------------------------------------------------------- Bloom
@query(
    "bloom_join_stats",
    oracle=f"""
    WITH dim AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    dpos AS (
      SELECT DISTINCT pos FROM (
        {SK.bloom_positions_sql("dim", "c_custkey", "c_custkey", _BLOOM_M)})),
    probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
    ppos AS ({SK.bloom_positions_sql("probe", "k", "k", _BLOOM_M)}),
    pass_keys AS (
      SELECT k FROM (
        SELECT p.k, COUNT(*) AS hits
        FROM ppos p JOIN dpos d ON p.pos = d.pos GROUP BY p.k)
      WHERE hits = 7),
    flags AS (
      SELECT probe.k,
             CASE WHEN pass_keys.k IS NOT NULL THEN 1 ELSE 0 END AS bloom_pass,
             CASE WHEN dim.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS true_match
      FROM probe
      LEFT JOIN pass_keys ON probe.k = pass_keys.k
      LEFT JOIN dim ON probe.k = dim.c_custkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
           CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(true_match) AS BIGINT) AS n_true_match,
           CAST(SUM(bloom_pass) - SUM(true_match) AS BIGINT) AS false_positives
    FROM flags
    """,
)
def bloom_join_stats(spark, sf_dir):
    """Bloom-filtered join pre-screen: build a 2^16-bit / 7-hash filter
    from the BUILDING-segment customer keys, probe every ordering
    customer, and report pass/true/false-positive counts. The filter is
    ≤ m rows however large the build side — the broadcastable join
    pre-filter pattern AQE's runtime bloom pruning automates, made
    explicit and persistable across jobs. No false negatives by
    construction (asserted here: every true match passes)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    positions = SK.bloom_build(dim, "c_custkey", m=_BLOOM_M)
    probe = o.select(F.col("o_custkey").alias("k")).distinct()
    passed = SK.bloom_probe(probe, positions, "k", m=_BLOOM_M).withColumn(
        "bloom_pass", F.lit(1)
    )
    truth = dim.select(F.col("c_custkey").alias("k")).withColumn(
        "true_match", F.lit(1)
    )
    return (
        probe.join(passed, "k", "left")
        .join(truth, "k", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probe_keys"),
            F.coalesce(F.sum("bloom_pass"), F.lit(0))
            .cast("bigint")
            .alias("n_bloom_pass"),
            F.coalesce(F.sum("true_match"), F.lit(0))
            .cast("bigint")
            .alias("n_true_match"),
            (
                F.coalesce(F.sum("bloom_pass"), F.lit(0))
                - F.coalesce(F.sum("true_match"), F.lit(0))
            )
            .cast("bigint")
            .alias("false_positives"),
        )
    )
