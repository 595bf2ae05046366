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

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators import sketches as SK
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query
from delta_unity_duckdb_spark.functions.frames import CKPT_DESER

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
    values; theta-sketch family), plus a merged 'ALL' row DERIVED from
    the per-group sketches: every one of the k smallest hashes of the
    union is, within its own group, among that group's k smallest — so
    deduping the ≤ groups×k kept hashes and re-taking the k smallest IS
    the sketch of the union. The base table is scanned and hashed ONCE;
    the merge runs on sketch-sized data (≤ 5×64 rows here, and at 100 TB
    still ≤ groups×k rows — the roll-up never rescans history).
    WindowGroupLimit pushes the rn<=k bound below the per-group sort, so
    the kept state is k rows per group."""
    o = load_table(spark, sf_dir, "orders")
    per_sk = SK.kmv_sketch(o, ["o_orderpriority"], "o_custkey", k=_KMV_K)
    # Checkpoint the ≤ groups×k sketch so the per-group and ALL arms share
    # one scan+hash pass instead of recomputing the lineage twice.
    per_sk = per_sk.localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    per = SK.kmv_estimate(per_sk, ["o_orderpriority"], k=_KMV_K)
    merged = (
        per_sk.withColumn("o_orderpriority", F.lit("ALL"))
        .select("o_orderpriority", "h")
        .distinct()
    )
    w_all = Window.partitionBy("o_orderpriority").orderBy("h")
    all_sk = merged.select(
        "o_orderpriority", "h", F.row_number().over(w_all).alias("rn")
    ).filter(F.col("rn") <= _KMV_K)
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
      SELECT t.word, MIN(COALESCE(c.cnt, 0)) AS cms_est
      FROM tpos t LEFT JOIN counters c ON t.row_i = c.row_i AND t.pos = c.pos
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


# ---------------------------------------------------------- KMV set ops
_KSET = 64
_H60_MAX = 1 << 60


@query(
    "kmv_set_ops",
    oracle=f"""
    WITH lab AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'A' ELSE 'B' END AS g,
             o_custkey
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
    sk AS ({SK.kmv_sql("lab", "g", "o_custkey", _KSET)}),
    kths AS (
      SELECT MIN(CASE WHEN n_kept < {_KSET} THEN {_H60_MAX} ELSE kth_min END)
               AS theta
      FROM sk),
    kept AS (
      SELECT DISTINCT g, {SK.hash60_sql("CAST(o_custkey AS VARCHAR)")} AS h
      FROM lab),
    keptrk AS (
      SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM kept),
    below AS (
      SELECT k.g, k.h FROM keptrk k, kths t
      WHERE k.rn <= {_KSET} AND k.h < t.theta),
    common AS (
      SELECT COUNT(*) AS n_common FROM below a JOIN below b
      ON a.h = b.h AND a.g = 'A' AND b.g = 'B'),
    uni AS (SELECT COUNT(DISTINCT h) AS n_union FROM below),
    truth AS (
      SELECT COUNT(*) AS true_inter FROM
        (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') x
        JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH') y
        USING (o_custkey))
    SELECT CAST(t.theta AS BIGINT) AS theta,
           CAST(c.n_common AS BIGINT) AS n_common_kept,
           ROUND(c.n_common * CAST({float(_H60_MAX)!r} AS DOUBLE)
                 / CAST(t.theta AS DOUBLE), 2) AS inter_est,
           ROUND(u.n_union * CAST({float(_H60_MAX)!r} AS DOUBLE)
                 / CAST(t.theta AS DOUBLE), 2) AS union_est,
           CAST(tr.true_inter AS BIGINT) AS true_intersection
    FROM kths t, common c, uni u, truth tr
    """,
)
def kmv_set_ops(spark, sf_dir):
    """Theta-sketch set expressions — the capability HLL cannot provide:
    estimate |A∩B| and |A∪B| for the urgent-vs-high-priority customer
    sets from their KMV sketches alone. Both sketches share one portable
    hash, so below a common threshold θ = min(θ_A, θ_B) each kept hash is
    a uniform sample of the union; the intersection estimate is
    |kept_A ∩ kept_B| / θ-fraction. At 100 TB the sketches are built in
    one pass (k rows each) and every set expression afterwards touches
    ≤ 2k rows — no re-scan of the fact table per question asked. True
    intersection included for the accuracy check in tests."""
    o = load_table(spark, sf_dir, "orders")
    lab = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "A")
        .otherwise("B")
        .alias("g"),
        "o_custkey",
    )
    # The ≤2k-row sketch feeds four consumers (θ probe, both set sides,
    # union distinct): materialize once instead of re-scanning orders +
    # re-hashing per consumer — at scale this IS the point of a sketch
    # (build once, answer many set questions from k rows).
    sk = SK.kmv_sketch(lab, ["g"], "o_custkey", k=_KSET).localCheckpoint(
        eager=True, storageLevel=CKPT_DESER
    )
    kth = SK.kmv_estimate(sk, ["g"], k=_KSET).select(
        F.when(F.col("n_kept") < _KSET, F.lit(_H60_MAX))
        .otherwise(F.col("kth_min"))
        .alias("theta_g")
    )
    kths = kth.groupBy().agg(F.min("theta_g").alias("theta"))
    below = sk.crossJoin(F.broadcast(kths)).filter(F.col("h") < F.col("theta"))
    a = below.filter(F.col("g") == "A").select("h")
    b = below.filter(F.col("g") == "B").select(F.col("h").alias("h2"))
    common = a.join(b, a["h"] == b["h2"]).agg(
        F.count(F.lit(1)).alias("n_common")
    )
    uni = below.select("h").distinct().agg(F.count(F.lit(1)).alias("n_union"))
    x = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    y = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()
    truth = x.join(y, "o_custkey").agg(F.count(F.lit(1)).alias("true_inter"))
    return (
        kths.crossJoin(common)
        .crossJoin(uni)
        .crossJoin(truth)
        .select(
            F.col("theta").cast("bigint").alias("theta"),
            F.col("n_common").cast("bigint").alias("n_common_kept"),
            F.round(
                F.col("n_common") * F.lit(float(_H60_MAX)) / F.col("theta").cast("double"), 2
            ).alias("inter_est"),
            F.round(
                F.col("n_union") * F.lit(float(_H60_MAX)) / F.col("theta").cast("double"), 2
            ).alias("union_est"),
            F.col("true_inter").cast("bigint").alias("true_intersection"),
        )
    )


# ------------------------------------------------- incremental HLL + CDC
@query(
    "hll_incremental_refresh",
    oracle=SK.hll_sql("events", "event_type", "user_id", _HLL_P)
    + " ORDER BY g",
)
def hll_incremental_refresh(spark, sf_dir):
    """Incremental distinct-count maintenance over a Delta change feed —
    the composition that makes sketches matter at 100 TB: the events
    table arrives as three Delta commits; the HLL register table is
    bootstrapped from v0 and then refreshed by sketching ONLY each
    commit's added rows (sources/delta_log.py read_delta_changes) and
    register-MAX-merging — never rescanning history. Because merge is
    exact, the maintained sketch is bit-identical to sketching the full
    table, which is exactly what the oracle checks (DuckDB replays the
    whole-table sketch; any drift between the incremental path and the
    batch path fails the hash)."""
    import tempfile

    from delta_unity_duckdb_spark.sources.delta_log import (
        read_delta,
        read_delta_changes,
        write_delta,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    t = tempfile.mkdtemp(prefix="hll_cdc_")
    for i in range(3):  # three append commits (v0, v1, v2)
        write_delta(ev.filter(F.col("event_id") % 3 == i), t)
    acc = SK.hll_sketch(
        read_delta(spark, t, version=0), ["event_type"], "user_id", p=_HLL_P
    )
    for v in (1, 2):
        batch = read_delta_changes(spark, t, from_version=v - 1, to_version=v)
        acc = SK.hll_merge(
            acc,
            SK.hll_sketch(batch, ["event_type"], "user_id", p=_HLL_P),
            ["event_type"],
        )
    return (
        SK.hll_estimate(acc, ["event_type"], p=_HLL_P)
        .withColumnRenamed("event_type", "g")
        .orderBy("g")
    )


# ------------------------------------------------------ quantile histogram
_H_LO, _H_HI, _H_BINS = 0.0, 1000.0, 200


@query(
    "hist_quantile_sketch",
    oracle=SK.hist_quantiles_sql(
        "events", "event_type", "value", [0.5, 0.9, 0.99], _H_LO, _H_HI, _H_BINS
    )
    + " ORDER BY g, q",
)
def hist_quantile_sketch(spark, sf_dir):
    """p50/p90/p99 of event value per type from a fixed-boundary
    histogram sketch — the mergeable quantile structure: per-day
    (group, bin) counters SUM together, so quantiles over any date range
    come from merged counters instead of re-sorting raw values (exact
    percentiles at 100 TB are a full sort per group; order-dependent
    GK/KLL merges aren't deterministic). ≤ bins+2 rows per group,
    map-side combined; estimates are a fixed IEEE op sequence over exact
    integer counters — engine-exact, hence a full value oracle."""
    e = load_table(spark, sf_dir, "events")
    sk = SK.hist_sketch(e, ["event_type"], "value", _H_LO, _H_HI, _H_BINS)
    return (
        SK.hist_quantiles(
            sk, ["event_type"], [0.5, 0.9, 0.99], _H_LO, _H_HI, _H_BINS
        )
        .withColumnRenamed("event_type", "g")
        .orderBy("g", "q")
    )
