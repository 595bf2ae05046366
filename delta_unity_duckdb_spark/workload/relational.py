"""Relational operator surface (SURVEY.md §2-B exact shapes + §2-C classes).

Each query is the idiomatic declarative Spark plan — Catalyst handles
pushdown/pruning/join selection; we only add explicit ``broadcast`` hints
for dimension tables and exact DECIMAL aggregation for cross-engine
reproducibility (see functions.numeric).

Determinism contract: any query with LIMIT orders by a unique key first;
queries without LIMIT need no ORDER BY (the driver hash is
order-insensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.numeric import (
    DEC38,
    davg,
    dec,
    dmoney,
    drate,
    dsum,
    sql_davg,
    sql_dsum,
)
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- B1: scan+limit
@query(
    "scan_limit",
    oracle="SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 10",
)
def scan_limit(spark, sf_dir):
    """Full scan with bound (reference default query, delta-unity-duckdb.js:327-330)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .limit(10)
    )


# ---------------------------------------------------------------- B2: projection
@query(
    "projection",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
    FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 100
    """,
)
def projection(spark, sf_dir):
    """Column-list projection (test_scd_missions.py:29 shape). Column pruning
    reaches the Parquet scan — ReadSchema carries only 5 columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .limit(100)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    )


# ---------------------------------------------------------------- B3: count(*)
@query("count_star", oracle="SELECT COUNT(*) AS count FROM lineitem")
def count_star(spark, sf_dir):
    """Scalar row count (getTableStats, delta-unity-duckdb.js:425)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("count"))


# ---------------------------------------------------------------- B4: top-k group count (flagship)
@query(
    "topk_group_count",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS count FROM lineitem
    GROUP BY l_returnflag ORDER BY count DESC, l_returnflag LIMIT 5
    """,
)
def topk_group_count(spark, sf_dir):
    """The reference's documented example (README.md:133): group-count top-k.
    Partial (map-side) aggregation then a 5-row TakeOrderedAndProject —
    shuffle carries only one row per distinct key."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "l_returnflag")
        .limit(5)
    )


# ---------------------------------------------------------------- B5: conditional agg
@query(
    "conditional_agg",
    oracle="""
    SELECT COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS r_cnt,
           COUNT(CASE WHEN l_returnflag <> 'R' THEN 1 END) AS other_cnt
    FROM lineitem
    """,
)
def conditional_agg(spark, sf_dir):
    """CASE-inside-COUNT fusion (test_pg_query.py:42-47; README.md:386 advises
    combining aggregates into one statement — one scan, one partial agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r_cnt"),
        F.count(F.when(F.col("l_returnflag") != "R", 1)).alias("other_cnt"),
    )


# ---------------------------------------------------------------- B6: equality filter
@query(
    "filter_eq",
    oracle="""
    SELECT * FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_orderkey LIMIT 1000
    """,
)
def filter_eq(spark, sf_dir):
    """Predicate pushed to the Parquet scan (PushedFilters: EqualTo)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .orderBy("o_orderkey")
        .limit(1000)
    )


# ---------------------------------------------------------------- C filters: range/IN/LIKE/null
@query(
    "filter_range_in_like_null",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#1', 'Brand#5', 'Brand#12')
      AND p_name LIKE '%ol%'
      AND p_type IS NOT NULL
    ORDER BY p_partkey LIMIT 500
    """,
)
def filter_range_in_like_null(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_size").between(10, 30)
            & F.col("p_brand").isin("Brand#1", "Brand#5", "Brand#12")
            & F.col("p_name").like("%ol%")
            & F.col("p_type").isNotNull()
        )
        .orderBy("p_partkey")
        .limit(500)
        .select("p_partkey", "p_name", "p_brand", "p_size")
    )


# ---------------------------------------------------------------- B7: sort+limit
@query(
    "sort_limit",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 5
    """,
)
def sort_limit(spark, sf_dir):
    """Top-k sort — planner emits TakeOrderedAndProject (no full sort)."""
    return (
        _t(spark, sf_dir, "customer")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(5)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------- B8: null-safe change detection
@query(
    "nullsafe_change",
    oracle="""
    SELECT c_custkey, (c_name IS DISTINCT FROM c_mktsegment) AS changed
    FROM customer ORDER BY c_custkey LIMIT 200
    """,
)
def nullsafe_change(spark, sf_dir):
    """Null-safe inequality (reference change guard delta_to_postgres_scd.py:252,
    expressed null-correctly via <=> — see functions.predicates)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            (~F.col("c_name").eqNullSafe(F.col("c_mktsegment"))).alias("changed"),
        )
        .orderBy("c_custkey")
        .limit(200)
    )


# ---------------------------------------------------------------- C aggs: multi-agg group by
@query(
    "group_aggs",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sql_dsum('l_quantity', 'sum_qty')},
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           {sql_davg('l_extendedprice', 'avg_price')}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def group_aggs(spark, sf_dir):
    """Multi-aggregate (sum/min/max/count-distinct/avg), exact at any
    partition count, in ONE scan and ONE data-sized exchange (the fused
    form the round-5 two-arm join deferred to "IO-bound cluster scale";
    measured better even locally once the EXPAND is gone).

    Level 1 groups by (l_returnflag, l_partkey): the partial aggregate
    collapses the fact rows to distinct (flag, part) pairs map-side, so
    the only full exchange carries ~|parts|·|flags| rows — and because
    the distinct key is now the GROUP key, COUNT DISTINCT becomes a
    plain COUNT at level 2 with no EXPAND replication (a mixed
    distinct/non-distinct aggregate would 2× the scan before anything
    collapses). The exact decimal sums ride the same pass as fixed-point
    int64 partials: within a (flag, part) pair a raw long sum is safe to
    ~2·10⁸ rows/pair (p4 ≤ 4·10¹⁰ per row), far past any real key's
    multiplicity; level 2 then applies the fx hi/lo split at 10⁹ per
    (group, partition) before the few-row decimal merge — the same
    overflow algebra as fx_sums (numeric.py), restated here because the
    input is pre-aggregated pairs rather than raw rows.

    min/max/count are associative, so re-aggregating the pair-level
    partials is exact; n counts all rows (NULL-part pairs included via
    SUM(c)) while distinct_parts counts only non-NULL parts
    (COUNT(l_partkey)) — matching COUNT(*) / COUNT(DISTINCT col)
    semantics, NULL group keys preserved end-to-end."""
    li = _t(spark, sf_dir, "lineitem")

    def _chk(expr, lo, hi, tag):
        ok = expr.isNull() | ((expr >= F.lit(lo)) & (expr <= F.lit(hi)))
        return F.when(ok, expr).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"group_aggs[{tag}]: per-row value outside "
                          f"[{lo}, {hi}]: "),
                    expr.cast("string"),
                )
            )
        )

    q4 = _chk(
        F.expr("CAST(l_quantity * 10000 + 0.5d AS BIGINT)"), 0, 10**7, "q4"
    )
    p4 = _chk(
        F.expr("CAST(l_extendedprice * 10000 + 0.5d AS BIGINT)"),
        0, 4 * 10**10, "p4",
    )
    lvl1 = (
        li.select(
            "l_returnflag", "l_partkey", "l_extendedprice",
            q4.alias("_q4"), p4.alias("_p4"),
        )
        .groupBy("l_returnflag", "l_partkey")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
            F.sum("_q4").alias("sq4"),
            F.sum("_p4").alias("sp4"),
            F.count("_p4").alias("cp4"),
        )
    )
    part2 = lvl1.groupBy(
        "l_returnflag", F.spark_partition_id().alias("_pid")
    ).agg(
        F.sum(F.expr("sq4 div 1000000000")).alias("_hi_q"),
        F.sum(F.expr("sq4 % 1000000000")).alias("_lo_q"),
        F.sum(F.expr("sp4 div 1000000000")).alias("_hi_p"),
        F.sum(F.expr("sp4 % 1000000000")).alias("_lo_p"),
        F.sum("c").alias("n"),
        F.count("l_partkey").alias("dp"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.sum("cp4").alias("np"),
    )
    d19 = lambda c: F.sum(F.col(c).cast("decimal(19,0)"))  # noqa: E731
    merged = part2.groupBy("l_returnflag").agg(
        d19("_hi_q").alias("_HI_q"), d19("_lo_q").alias("_LO_q"),
        d19("_hi_p").alias("_HI_p"), d19("_lo_p").alias("_LO_p"),
        F.sum("n").alias("n"), F.sum("dp").alias("distinct_parts"),
        F.min("mn").alias("min_price"), F.max("mx").alias("max_price"),
        F.sum("np").alias("np"),
    )
    # Reassemble value = HI·10^(9-4) + LO·10^-4, precision-tracked as in
    # fx_sums (every intermediate ≤ 38 digits, no rescale loss).
    fq = F.expr(
        "CAST(_HI_q AS DECIMAL(22,0)) * CAST(100000 AS DECIMAL(6,0))"
        " + CAST(_LO_q AS DECIMAL(22,0)) * CAST(0.0001 AS DECIMAL(5,4))"
    )
    fp = F.expr(
        "CAST(_HI_p AS DECIMAL(22,0)) * CAST(100000 AS DECIMAL(6,0))"
        " + CAST(_LO_p AS DECIMAL(22,0)) * CAST(0.0001 AS DECIMAL(5,4))"
    )
    return merged.select(
        "l_returnflag",
        "n",
        fq.cast(DEC38).alias("sum_qty"),
        "min_price",
        "max_price",
        "distinct_parts",
        F.round(fp.cast("double") / F.col("np"), 6).alias("avg_price"),
    )


# ---------------------------------------------------------------- C aggs: rollup
@query(
    "rollup_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark, sf_dir):
    """Pre-aggregate to the (flag, status) base (≤ a few rows per
    partition after partial agg), THEN roll up the 6-row base — round
    10: Expand replicated every fact row ×3 through the decimal
    aggregate (0.74 s vs a 0.06 s oracle at sf0.1); replicating the base
    grid instead is free. Decimal addition is associative/exact, so
    sums-of-sums are value-identical; COALESCE keeps the grand-total
    row's COUNT(*) = 0 on an empty table (SUM over no rows is NULL)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(dec("l_quantity")).alias("_s")
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
        F.sum("_s").cast(DEC38).alias("sum_qty"),
    )


# ---------------------------------------------------------------- C aggs: cube
@query(
    "cube_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark, sf_dir):
    """Same pre-aggregate-then-expand shape as rollup_agg (round 10):
    CUBE's Expand replicated every fact row ×4 through the decimal
    aggregate — 1.36 s vs a 0.07 s oracle at sf0.1; cubing the 6-row
    base grid is free and value-identical (exact decimal addition)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec("l_extendedprice")).alias("_s"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
        F.sum("_s").cast(DEC38).alias("sum_price"),
    )


# ---------------------------------------------------------------- C joins: inner + agg
@query(
    "join_inner",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders, {sql_dsum('o_totalprice', 'sum_total')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner(spark, sf_dir):
    """Fact⋈dim with aggregation. At 100 TB the dim side is broadcast when it
    fits (hint below); the agg is partial before the segment shuffle."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_total"))
    )


# ---------------------------------------------------------------- C joins: left outer
@query(
    "join_left",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey LIMIT 500
    """,
)
def join_left(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
        .limit(500)
    )


# ---------------------------------------------------------------- C joins: left semi (EXISTS)
@query(
    "join_semi",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 4000)
    ORDER BY c_custkey LIMIT 500
    """,
)
def join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 4000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(500)
    )


# ---------------------------------------------------------------- C joins: left anti (NOT EXISTS)
@query(
    "join_anti",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 4000)
    ORDER BY c_custkey LIMIT 500
    """,
)
def join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 4000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(500)
    )


# ---------------------------------------------------------------- B14: self-join ($TABLE/g semantics)
@query(
    "self_join",
    oracle="""
    SELECT COUNT(*) AS pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    """,
)
def self_join(spark, sf_dir):
    """Self-join pair count — the capability the reference's global $TABLE
    substitution preserves (delta-unity-duckdb.js:334)."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    a, b = o.alias("a"), o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).agg(F.count(F.lit(1)).alias("pairs"))


# ---------------------------------------------------------------- C windows: ranking
@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2 ORDER BY o_custkey, rn LIMIT 500
    """,
)
def window_rank(spark, sf_dir):
    """Top-N per group — the canonical window pattern; one shuffle on the
    partition key, no self-join."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
        .limit(500)
    )


# ---------------------------------------------------------------- C windows: frame aggregate
@query(
    "window_frame_sum",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS rolling_sum
    FROM events WHERE ts IS NOT NULL ORDER BY event_id LIMIT 1000
    """,
)
def window_frame_sum(spark, sf_dir):
    """Sliding-frame sum in DECIMAL: engines may reassociate frame sums
    (segment trees), so exact arithmetic is required for reproducibility."""
    # NULL-ts rows excluded on both sides: no sequence position
    # (adversarial-ts sweep — Spark orders NULL first, DuckDB last)
    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            F.sum(dec("value")).over(w).cast("decimal(38,6)").alias("rolling_sum"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


# ---------------------------------------------------------------- C windows: lag/lead
@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events WHERE ts IS NOT NULL ORDER BY event_id LIMIT 1000
    """,
)
def window_lag_lead(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


# ---------------------------------------------------------------- C set ops
@query(
    "set_ops",
    oracle="""
    SELECT 'u' AS tag, c_custkey AS key FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT 'u' AS tag, o_custkey AS key FROM orders WHERE o_custkey <= 50
    UNION ALL
    SELECT 'i' AS tag, key FROM (
      SELECT c_custkey AS key FROM customer WHERE c_custkey <= 100
      INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'e' AS tag, key FROM (
      SELECT c_custkey AS key FROM customer WHERE c_custkey <= 100
      EXCEPT SELECT o_custkey FROM orders)
    """,
)
def set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c100 = c.filter(F.col("c_custkey") <= 100).select(F.col("c_custkey").alias("key"))
    o50 = o.filter(F.col("o_custkey") <= 50).select(F.col("o_custkey").alias("key"))
    okeys = o.select(F.col("o_custkey").alias("key"))
    union = c100.unionAll(o50).select(F.lit("u").alias("tag"), "key")
    inter = c100.intersect(okeys).select(F.lit("i").alias("tag"), "key")
    exc = c100.exceptAll(okeys).distinct().select(F.lit("e").alias("tag"), "key")
    return union.unionAll(inter).unionAll(exc)


# ---------------------------------------------------------------- C distinct
@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------- C scalar: strings
@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_brand) AS brand_upper,
           SUBSTR(p_name, 1, 5) AS name_pfx,
           REPLACE(p_type, 'O', '0') AS type_repl,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           TRIM(CONCAT(' ', p_name, ' ')) AS name_trim
    FROM part ORDER BY p_partkey LIMIT 300
    """,
)
def string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 5).alias("name_pfx"),
            F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_repl"),
            F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
            F.length("p_name").cast("long").alias("name_len"),
            F.trim(F.concat(F.lit(" "), "p_name", F.lit(" "))).alias("name_trim"),
        )
        .orderBy("p_partkey")
        .limit(300)
    )


# ---------------------------------------------------------------- C scalar: regex
@query(
    "regex_funcs",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS name_devowel,
           REGEXP_MATCHES(p_name, '^[a-z]+ ') AS starts_word
    FROM part ORDER BY p_partkey LIMIT 300
    """,
)
def regex_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devowel"),
            F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
        )
        .orderBy("p_partkey")
        .limit(300)
    )


# ---------------------------------------------------------------- C scalar: dates
@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_mon,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders ORDER BY o_orderkey LIMIT 300
    """,
)
def date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_mon"),
            F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy("o_orderkey")
        .limit(300)
    )


# ---------------------------------------------------------------- C scalar: math
@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 2) AS price_r2,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           SQRT(l_quantity) AS qty_sqrt,
           l_orderkey % 7 AS key_mod
    FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 300
    """,
)
def math_funcs(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price_r2"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.floor("l_quantity").cast("long").alias("qty_floor"),
            F.ceil("l_quantity").cast("long").alias("qty_ceil"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .limit(300)
    )


# ---------------------------------------------------------------- C scalar: arrays
@query(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           STRING_SPLIT(text, ' ')[1] AS first_tok,
           COALESCE(LIST_CONTAINS(STRING_SPLIT(text, ' '), 'data'), FALSE) AS has_data
    FROM documents ORDER BY doc_id LIMIT 200
    """,
)
def array_funcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.element_at(toks, 1).alias("first_tok"),
            # COALESCE on BOTH sides: a NULL boolean round-trips through
            # pandas as None (Spark) vs NaN (DuckDB) and the driver's
            # type-sensitive hash would flag a spurious mismatch; NULL
            # text "contains no token" is the explicit spec.
            F.coalesce(F.array_contains(toks, "data"), F.lit(False)).alias(
                "has_data"
            ),
        )
        .orderBy("doc_id")
        .limit(200)
    )


# ---------------------------------------------------------------- C json
@query(
    "json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events ORDER BY event_id LIMIT 1000
    """,
)
def json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.select("event_id", k.alias("k_str"), k.cast("long").alias("k_val"))
        .orderBy("event_id")
        .limit(1000)
    )


# ---------------------------------------------------------------- C CTE + subquery
_CTE_SQL = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, total_spent, n_orders
    FROM customer JOIN spend ON c_custkey = o_custkey
    WHERE total_spent > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                / COUNT(*) FROM orders)
"""


@query("cte_subquery", oracle=_CTE_SQL)
def cte_subquery(spark, sf_dir):
    """CTE + scalar subquery (REPL accepts WITH, query_sync_table.py:113).
    One shared ANSI-SQL text runs on both engines."""
    from delta_unity_duckdb_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CTE_SQL)


# ---------------------------------------------------------------- B15: CASE expression
@query(
    "case_expr",
    oracle="""
    SELECT CASE WHEN o_totalprice < 1000 THEN 'low'
                WHEN o_totalprice < 5000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def case_expr(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 1000, "low")
        .when(F.col("o_totalprice") < 5000, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------- B9/B10: schema introspection
_SPARK_TO_DUCK = {
    "timestamp_ntz": "TIMESTAMP",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "timestamp": "TIMESTAMP",
    "boolean": "BOOLEAN",
    "date": "DATE",
}


@query(
    "describe_schema",
    oracle="SELECT column_name, column_type FROM (DESCRIBE lineitem)",
)
def describe_schema(spark, sf_dir):
    """Schema-as-rows (reference LIMIT-0 view + DESCRIBE trick,
    delta-unity-duckdb.js:496-501). Reads only Parquet footers — no data scan."""
    from delta_unity_duckdb_spark.functions.frames import local_rows_df

    li = _t(spark, sf_dir, "lineitem")
    rows = [
        (f.name, _SPARK_TO_DUCK.get(f.dataType.simpleString(), f.dataType.simpleString().upper()))
        for f in li.schema.fields
    ]
    return local_rows_df(spark, rows, "column_name string, column_type string")


# ---------------------------------------------------------------- deterministic sample
@query(
    "sample_mod",
    oracle=f"""
    SELECT COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem WHERE l_orderkey % 97 = 0
    """,
)
def sample_mod(spark, sf_dir):
    """Deterministic systematic sample via key modulus (engine-portable,
    unlike USING SAMPLE / df.sample which are RNG-dependent)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 97 == 0).agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


# ---------------------------------------------------------------- TPC-H Q1 shape (pricing summary)
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))
                    * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — the classic wide-aggregate scan, 8 measures in one
    pass, computed in SCALE-4 FIXED-POINT INT64 instead of per-row decimal.

    Why not decimal all the way down (the pre-round-5 form): Spark
    aggregates DECIMAL via per-row BigDecimal allocation + unscaled-value
    rescaling, which measured ~30× DuckDB's int128 accumulator at sf10
    (27.6 s vs 0.92 s warm) on a plan that was already minimal. The money
    columns are exact at 4 decimals (asserted by the oracle match: the
    DECIMAL(14,4)/(6,4) casts both engines agree on ARE the 4-decimal
    values), so every product is an exact integer at a known scale:

        q4  = quantity·10⁴                 ≤ 5·10⁵        (scale 4)
        p4  = extendedprice·10⁴            ≤ ~1.1·10⁹     (scale 4)
        a8  = p4·(10⁴ − d4)                ≤ ~1.1·10¹³    (scale 8)
        c12 = a8·(10⁴ + t4)                ≤ ~1.2·10¹⁷    (scale 12)

    All per-row arithmetic is long multiply/divide inside whole-stage
    codegen. Wide values are split at 10⁹ (hi = x div 10⁹, lo = x mod 10⁹)
    and summed per SCAN PARTITION (spark_partition_id in the grouping key),
    so an int64 partial never covers more than one partition's rows: worst
    addend is 10⁹, so any partition under ~9·10⁹ rows (vs ~10⁶ rows per
    128 MB split) is overflow-safe. The partial agg emits ≤|groups|·|parts|
    tiny rows; the final merge widens to DECIMAL and reassembles each exact
    value at its true scale with precision-tracked multiplies (every
    intermediate ≤ 38 digits — no precision-loss rounding), then applies
    the same DECIMAL(38,6) cast the oracle does, so results stay
    bit-identical to the decimal formulation at any partition count.
    Final-merge decimal casts bound the aggregate at ~10²² scale-4 units —
    ≈6·10²⁰ at 100 TB (6·10¹¹ rows) with 16× headroom; beyond that the
    non-ANSI cast nulls out and the oracle hash fails loudly."""
    from delta_unity_duckdb_spark.sources.tables import load_table_cpu_bound

    # Fixed-point extraction is CPU-light but the scan is still wide:
    # guard against degenerate single-row-group layouts.
    li = load_table_cpu_bound(spark, sf_dir, "lineitem")
    fx = li.filter(
        F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp")
    ).selectExpr(
        "l_returnflag",
        "l_linestatus",
        # value·10⁴ + 0.5 then truncate ≡ round-to-nearest for these
        # NONNEGATIVE inputs (the double error of value·10⁴ is ≤ ~1e-7 ≪
        # 0.5), recovering the exact 4-decimal integer. Deliberately not
        # ROUND(): Spark's double ROUND allocates a BigDecimal per row —
        # measured 4× the whole scan+agg wall at sf10 — while this form
        # stays a primitive double fma + cast in codegen.
        "CAST(l_quantity * 10000 + 0.5d AS BIGINT) AS q4",
        "CAST(l_extendedprice * 10000 + 0.5d AS BIGINT) AS p4",
        "CAST(l_discount * 10000 + 0.5d AS BIGINT) AS d4",
        "CAST(l_tax * 10000 + 0.5d AS BIGINT) AS t4",
    )
    part = (
        fx.selectExpr(
            "*",
            "p4 * (10000 - d4) AS a8",
            "p4 * (10000 - d4) * (10000 + t4) AS c12",
        )
        .groupBy(
            "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
        )
        .agg(
            F.sum("q4").alias("s_q4"),
            F.sum("p4").alias("s_p4"),
            F.sum(F.expr("a8 div 1000000000")).alias("s_a_hi"),
            F.sum(F.expr("a8 % 1000000000")).alias("s_a_lo"),
            F.sum(F.expr("c12 div 1000000000")).alias("s_c_hi"),
            F.sum(F.expr("c12 % 1000000000")).alias("s_c_lo"),
            F.sum("d4").alias("s_d4"),
            F.count("q4").alias("n_q"),
            F.count("p4").alias("n_p"),
            F.count("d4").alias("n_d"),
            F.count(F.lit(1)).alias("n_all"),
        )
    )
    # Final merge: handfuls of rows. Widen the per-partition longs to
    # DECIMAL(19,0) — which holds ANY int64, so this cast can never
    # overflow — and sum exactly (result (29,0)); then narrow each global
    # sum to its documented 100 TB bound before the scale assembly so
    # every multiply and add stays ≤ 38 digits (Spark mul: p1+p2+1 /
    # s1+s2; add: max(p1−s1,p2−s2)+max(s1,s2)+1) — no precision-loss
    # rescale anywhere, hence exact.
    d = lambda c: F.sum(F.col(c).cast("decimal(19,0)"))  # noqa: E731
    merged = part.groupBy("l_returnflag", "l_linestatus").agg(
        d("s_q4").alias("Sq"),  # global ≤ 3·10¹⁷ at 100 TB
        d("s_p4").alias("Sp"),  # ≤ 6·10²⁰
        d("s_a_hi").alias("Sah"),  # ≤ 6·10¹⁵
        d("s_a_lo").alias("Sal"),  # ≤ 6·10²⁰
        d("s_c_hi").alias("Sch"),  # ≤ 1.2·10²⁰
        d("s_c_lo").alias("Scl"),  # ≤ 6·10²⁰
        d("s_d4").alias("Sd"),  # ≤ 6·10¹⁵
        F.sum("n_q").alias("Nq"),
        F.sum("n_p").alias("Np"),
        F.sum("n_d").alias("Nd"),
        F.sum("n_all").alias("count_order"),
    )
    E4 = "CAST(0.0001 AS DECIMAL(5,4))"  # 10⁻⁴, exact scale shift
    E8 = "CAST(0.00000001 AS DECIMAL(9,8))"
    E12 = "CAST(0.000000000001 AS DECIMAL(13,12))"
    return merged.selectExpr(
        "l_returnflag",
        "l_linestatus",
        f"CAST(CAST(Sq AS DECIMAL(22,0)) * {E4} AS DECIMAL(38,6)) AS sum_qty",
        f"CAST(CAST(Sp AS DECIMAL(24,0)) * {E4} AS DECIMAL(38,6))"
        "  AS sum_base_price",
        # a = ah·10⁹ + al at scale 8 → value = ah·10 + al·10⁻⁸;
        # (21,0) + (34,8) → (35,8), exact, then the oracle's (38,6) cast.
        f"CAST(CAST(Sah AS DECIMAL(18,0)) * CAST(10 AS DECIMAL(2,0))"
        f"     + CAST(Sal AS DECIMAL(24,0)) * {E8} AS DECIMAL(38,6))"
        "  AS sum_disc_price",
        # c = ch·10⁹ + cl at scale 12 → value = ch·10⁻³ + cl·10⁻¹²;
        # (27,3) + (36,12) → (37,12), exact.
        f"CAST(CAST(Sch AS DECIMAL(22,0)) * CAST(0.001 AS DECIMAL(4,3))"
        f"     + CAST(Scl AS DECIMAL(22,0)) * {E12} AS DECIMAL(38,6))"
        "  AS sum_charge",
        # avgs replay the oracle exactly: exact decimal sum → double →
        # divide by the per-column non-null count → ROUND(…, 6).
        f"ROUND(CAST(CAST(Sq AS DECIMAL(22,0)) * {E4} AS DOUBLE) / Nq, 6)"
        "  AS avg_qty",
        f"ROUND(CAST(CAST(Sp AS DECIMAL(24,0)) * {E4} AS DOUBLE) / Np, 6)"
        "  AS avg_price",
        f"ROUND(CAST(CAST(Sd AS DECIMAL(22,0)) * {E4} AS DOUBLE) / Nd, 6)"
        "  AS avg_disc",
        "count_order",
    )


# ---------------------------------------------------------------- multi-way join (Q3 shape)
@query(
    "multiway_join_topk",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def multiway_join_topk(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, filtered dim broadcast, top-k by revenue.

    Join order matters at scale: the broadcast customer filter applies to
    ORDERS first (segment selectivity ~1/5), so the fact-fact shuffle join
    sees a 5× smaller build side and the post-join aggregate 5× fewer
    rows, instead of joining all of lineitem⋈orders and filtering after."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o_seg = o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
    return (
        li.join(o_seg, li.l_orderkey == o_seg.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dmoney("l_extendedprice") * (1 - drate("l_discount")))
            .cast("decimal(38,6)")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- C joins: right outer
@query(
    "join_right",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey ORDER BY c_custkey LIMIT 500
    """,
)
def join_right(spark, sf_dir):
    """Right outer join — planner flips it to a left join on the swapped
    sides; customers without orders survive with n_orders = 0."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
        .limit(500)
    )


# ---------------------------------------------------------------- C joins: full outer
@query(
    "join_full",
    oracle="""
    WITH big AS (
      SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
    ), neg AS (
      SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_acctbal < 0
    )
    SELECT COALESCE(big.k, neg.k) AS custkey, n_orders, CAST(c_acctbal AS DECIMAL(14,2)) AS c_acctbal
    FROM big FULL OUTER JOIN neg ON big.k = neg.k
    """,
)
def join_full(spark, sf_dir):
    """Full outer join of two derived sets with unmatched rows on BOTH
    sides (heavy orderers vs negative-balance customers)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        o.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )
    neg = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("k2"), F.col("c_acctbal")
    )
    return big.join(neg, big.k == neg.k2, "full").select(
        F.coalesce("k", "k2").alias("custkey"),
        "n_orders",
        F.col("c_acctbal").cast("decimal(14,2)").alias("c_acctbal"),
    )


# ---------------------------------------------------------------- C joins: cross
@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name LIMIT 200
    """,
)
def join_cross(spark, sf_dir):
    """Explicit cartesian product (tiny×tiny only — a guarded operation at
    scale; the planner broadcasts the smaller side)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n).orderBy("r_name", "n_name").limit(200)


# ---------------------------------------------------------------- C agg: GROUPING SETS
@query(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (distinct from rollup/cube): per-flag,
    per-status, and grand-total groups in one pass. Round 10: the sets
    are computed over the pre-aggregated (flag, status) base instead of
    Expand-replicating every fact row ×3 through the decimal aggregate
    (0.87 s vs a 0.05 s oracle) — exact decimal sums-of-sums, COALESCE
    keeps the grand-total COUNT(*) = 0 on empty input."""
    _t(spark, sf_dir, "lineitem").groupBy(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec("l_quantity")).alias("_s"),
    ).createOrReplaceTempView("__li_gs_base")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COALESCE(SUM(_n), 0) AS BIGINT) AS n,
               CAST(SUM(_s) AS DECIMAL(38,6)) AS sum_qty
        FROM __li_gs_base
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------- C agg: pivot
@query(
    "pivot_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS status_f,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS status_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_agg(spark, sf_dir):
    """groupBy().pivot() with an explicit value list — the planner emits a
    single-pass conditional aggregation, no extra shuffle per column."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "status_f", "O": "status_o"})
    )


# ---------------------------------------------------------------- C agg: exact percentiles
@query(
    "percentile_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_agg(spark, sf_dir):
    """Exact interpolated percentiles (SQL PERCENTILE_CONT semantics in
    both engines). At scale prefer approx_percentile — registered
    separately as a rows-only check because sketches differ per engine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
    )


# ---------------------------------------------------------------- C agg: sketches
@query(
    "approx_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           ABS(CAST(approx_count_distinct(l_orderkey) AS DOUBLE)
               - COUNT(DISTINCT l_orderkey))
             <= 0.05 * COUNT(DISTINCT l_orderkey) AS approx_orders_ok,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS exact_p50,
           ABS(CAST(approx_quantile(l_quantity, 0.5) AS DOUBLE)
               - quantile_cont(l_quantity, 0.5)) <= 2.0 AS approx_p50_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_aggs(spark, sf_dir):
    """HLL distinct-count + quantile sketches: the 100 TB path where exact
    DISTINCT/percentile shuffles are unaffordable. The raw estimates are
    engine-specific (Spark HLL++ vs DuckDB HLL, GK vs t-digest), so the
    value-level contract verified here is the one that transfers: each
    engine's sketch agrees with the EXACT answer within a 5σ bound (5%
    relative for distinct at rsd=0.01 — the default 0.05 is a STANDARD
    deviation, measured overshooting 5% on this data — and 2.0 quantity
    units for the median at accuracy=1000). Both engines emit the exact values
    plus the bound verdicts — hash-comparable despite different sketch
    internals. The exact arms exist only to certify the sketches; a
    production 100 TB run keeps just the approx columns.

    Plan note (round-9 fix): mixing COUNT(DISTINCT) with the sketch
    aggregates in ONE agg made Catalyst's distinct rewrite group the
    FIRST phase by (l_returnflag, l_orderkey) — ~|orders| groups — and
    compute partial HLL++/percentile buffers (rsd=0.01 ⇒ a ~13 KB
    register array) PER GROUP: ~2 GB of sketch state through two
    ObjectHashAggregate exchanges, >300 s at sf0.1. The distinct arm and
    the sketch arms are now separate aggregations broadcast-joined on the
    3-row group key (guide §2.3 'shuffle fewer bytes': sketch partials
    now exist only per (flag, partition)); same aggregates, same inputs,
    identical values — 117 s → sub-second."""
    li = _t(spark, sf_dir, "lineitem")
    exact = (
        # COUNT(DISTINCT x) ignores NULLs; the group-then-count rewrite
        # would count a NULL orderkey as one distinct group — filter it
        # out so the rewrite keeps COUNT(DISTINCT) semantics exactly
        # (benign on TPC-H where orderkey is non-null, but the aggregate
        # claims identity, so it must BE identical).
        li.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_returnflag", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    exact_p50 = F.percentile("l_quantity", F.lit(0.5))
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("_approx_orders"),
        F.round(exact_p50, 4).alias("exact_p50"),
        (
            F.abs(
                F.percentile_approx("l_quantity", 0.5, 1000).cast("double")
                - exact_p50
            )
            <= 2.0
        ).alias("approx_p50_ok"),
    )
    # LEFT + null-safe equality + COALESCE(0): a group whose orderkeys
    # are all NULL has no row in `exact` (COUNT(DISTINCT) would say 0),
    # and a NULL returnflag group must still match itself — both are
    # non-events on TPC-H but part of the aggregate's exact semantics.
    return (
        sketches.alias("s")
        .join(
            F.broadcast(exact).alias("e"),
            F.col("s.l_returnflag").eqNullSafe(F.col("e.l_returnflag")),
            "left",
        )
        .select(
            F.col("s.l_returnflag").alias("l_returnflag"),
            F.coalesce(F.col("e.exact_orders"), F.lit(0)).alias("exact_orders"),
            (
                F.abs(
                    F.col("_approx_orders").cast("double")
                    - F.coalesce(F.col("e.exact_orders"), F.lit(0))
                )
                <= 0.05 * F.coalesce(F.col("e.exact_orders"), F.lit(0))
            ).alias("approx_orders_ok"),
            "exact_p50",
            "approx_p50_ok",
        )
    )


# ---------------------------------------------------------------- C subqueries: EXISTS / NOT EXISTS / scalar
@query(
    "exists_subquery",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey
                      AND o2.o_orderstatus = 'F')
      AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    ORDER BY c_custkey LIMIT 200
    """,
)
def exists_subquery(spark, sf_dir):
    """Correlated EXISTS/NOT EXISTS + scalar subquery — Catalyst
    decorrelates to semi/anti joins and a broadcast scalar."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__cust_eq")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__ord_eq")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM __cust_eq c
        WHERE EXISTS (SELECT 1 FROM __ord_eq o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM __ord_eq o2 WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderstatus = 'F')
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM __cust_eq)
        ORDER BY c_custkey LIMIT 200
        """
    )


# ---------------------------------------------------------------- C multi-join chain (Q5 shape)
@query(
    "regional_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: a 5-table join chain. The dimension chain
    (region→nation→customer) collapses into broadcast lookups against the
    fact tables; only the orders⋈lineitem join shuffles. Catalyst reorders
    the filtered region scan to the front (one region → 1/5 of nations)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    dims = F.broadcast(
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.sum(dmoney("l_extendedprice") * (1 - drate("l_discount")))
            .cast("decimal(38,6)")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------- C map functions
@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           (element_at(map(['type'], [event_type]), 'type'))[1] AS type_val,
           CAST(cardinality(map(['type','uid'], [event_type, CAST(user_id AS VARCHAR)])) AS INTEGER) AS map_size
    FROM events ORDER BY event_id LIMIT 500
    """,
)
def map_funcs(spark, sf_dir):
    """MapType construction + element_at + cardinality (§2-C array/map
    class). Maps never appear in the reference's own data but ride the
    passthrough surface; Spark's MapType covers them natively."""
    e = _t(spark, sf_dir, "events")
    m2 = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return (
        e.select(
            "event_id",
            F.element_at(F.create_map(F.lit("type"), F.col("event_type")), "type").alias("type_val"),
            F.size(m2).cast("int").alias("map_size"),
        )
        .orderBy("event_id")
        .limit(500)
    )


@query(
    "string_agg_group",
    oracle="""
    SELECT r.r_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)
def string_agg_group(spark, sf_dir):
    """Ordered string aggregation (STRING_AGG / LISTAGG): collect_list is
    partition-order-nondeterministic, so sort the array before joining —
    the only reproducible formulation at scale. Region side broadcasts."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS measure,
           CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    """,
)
def unpivot_melt(spark, sf_dir):
    """UNPIVOT / melt (wide -> long): the inverse of ``pivot_agg``. Spark
    plans Expand over the scan — no shuffle, no join; output is 2x the
    input rows regardless of scale."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    ).unpivot("p_partkey", ["p_retailprice", "p_size"], "measure", "value")


@query(
    "correlated_scalar_agg",
    oracle="""
    SELECT l.l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6))
             AS sum_price
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 5
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """,
)
def correlated_scalar_agg(spark, sf_dir):
    """TPC-H Q17 shape: a correlated scalar *aggregate* subquery
    (below-20%%-of-part-average quantity). Catalyst decorrelates it into a
    per-partkey aggregate joined back to the fact — one extra keyed
    shuffle instead of a per-row subquery execution, which is the only
    formulation that scales. (AVG over integer-valued quantities is exact
    in double, so the predicate is reproducible across engines.)"""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_csa")
    _t(spark, sf_dir, "part").createOrReplaceTempView("__pt_csa")
    return spark.sql(
        """
        SELECT l.l_partkey,
               COUNT(*) AS n_small,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6))
                 AS sum_price
        FROM __li_csa l JOIN __pt_csa p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 5
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM __li_csa l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey
        """
    )


@query(
    "delta_time_travel",
    oracle="""
    SELECT 0 AS version, COUNT(*) AS n_rows FROM customer
    UNION ALL
    SELECT 1, COUNT(*) + (SELECT COUNT(*) FROM customer WHERE c_custkey % 10 = 0)
    FROM customer
    ORDER BY version
    """,
)
def delta_time_travel(spark, sf_dir):
    """Delta transaction-log round-trip with time travel (the reference's
    core delta_scan capability, delta-unity-duckdb.js:330, rebuilt via
    sources/delta_log.py — no delta-spark needed): commit the customer
    snapshot (v0), append the mutated every-10th rows (v1), then read BOTH
    versions by log replay and report their row counts. A wrong
    add/remove reconciliation, a broken commit, or time travel reading
    the wrong file set all change the counts."""
    import tempfile

    from delta_unity_duckdb_spark.sources.delta_log import read_delta, write_delta
    from delta_unity_duckdb_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    t = tempfile.mkdtemp(prefix="delta_tt_")
    write_delta(cust, t)  # v0
    write_delta(cust.filter(F.col("c_custkey") % 10 == 0), t)  # v1 append
    v0 = read_delta(spark, t, version=0).agg(
        F.lit(0).alias("version"), F.count(F.lit(1)).alias("n_rows")
    )
    v1 = read_delta(spark, t).agg(
        F.lit(1).alias("version"), F.count(F.lit(1)).alias("n_rows")
    )
    return v0.unionByName(v1).orderBy("version")


@query(
    "delta_optimize_compaction",
    oracle="""
    SELECT 8 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,6))
             AS sum_acctbal,
           TRUE AS compacted,
           TRUE AS stats_survive,
           CAST(COUNT(*) AS BIGINT) AS pre_optimize_rows
    FROM customer
    """,
)
def delta_optimize_compaction(spark, sf_dir):
    """OPTIMIZE small-file compaction end-to-end — the 100 TB ingest
    reality: streaming appends land thousands of small files, scan task
    count and object-store listing are O(files), and routine bin-packing
    is what keeps a lakehouse table scannable. Eight small append
    commits (disjoint c_custkey mod-8 slices, 2 files each → v0..v7,
    16 files) then OPTIMIZE (v8, dataChange:false adds+removes,
    sources/delta_log.py:1122). The oracle checks, by value, that
    compaction is INVISIBLE: post-OPTIMIZE row count and exact decimal
    balance sum equal plain customer; ``compacted`` flips false (hash
    red) if the rewrite didn't actually shrink the file count;
    ``stats_survive`` flips false if the rewritten files lost their
    skipping stats; time travel to v7 (pre-OPTIMIZE) must still see
    every row — removes with dataChange:false stay replayable."""
    import tempfile

    from delta_unity_duckdb_spark.sources.delta_log import (
        optimize_delta,
        read_delta,
        snapshot,
        write_delta,
    )
    from delta_unity_duckdb_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    t = tempfile.mkdtemp(prefix="delta_opt_")
    for i in range(8):  # v0..v7: the small-files ingest pattern
        write_delta(cust.filter(F.col("c_custkey") % 8 == i).repartition(2), t)
    n_before = len(snapshot(spark, t).adds)
    res = optimize_delta(spark, t)
    snap = snapshot(spark, t)
    compacted = (
        res["files_removed"] == n_before
        and 0 < res["files_added"] < n_before
        and len(snap.adds) == res["files_added"]
    )
    stats_survive = all(a.get("stats") for a in snap.adds.values())
    pre_rows = read_delta(spark, t, version=7).count()
    return read_delta(spark, t).agg(
        F.lit(res["version"]).cast("bigint").alias("version"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
        .cast("decimal(38,6)")
        .alias("sum_acctbal"),
        F.lit(bool(compacted)).alias("compacted"),
        F.lit(bool(stats_survive)).alias("stats_survive"),
        F.lit(pre_rows).cast("bigint").alias("pre_optimize_rows"),
    )


@query(
    "delta_merge_upsert",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN 'MERGED' ELSE c_mktsegment END AS c_mktsegment,
           CASE WHEN c_custkey % 7 = 0 THEN -c_acctbal ELSE c_acctbal END AS c_acctbal
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000, 'NEW', 0.0 FROM customer WHERE c_custkey % 97 = 0
    """,
)
def delta_merge_upsert(spark, sf_dir):
    """Generic MERGE INTO on the minimal Delta log (B11 generalized beyond
    SCD2): write customer as a key-clustered Delta table, merge a source
    that updates every 7th key and inserts fresh keys, read back the final
    state. File-level copy-on-write: only files whose stats ranges can hold
    a source key are rewritten (sources/delta_log.py merge_delta)."""
    import tempfile

    from delta_unity_duckdb_spark.sources.delta_log import merge_delta, read_delta, write_delta
    from delta_unity_duckdb_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    t = tempfile.mkdtemp(prefix="delta_merge_")
    write_delta(
        cust.repartitionByRange(4, "c_custkey").sortWithinPartitions("c_custkey"), t
    )
    updates = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("MERGED").alias("c_mktsegment"),
        (-F.col("c_acctbal")).alias("c_acctbal"),
    )
    inserts = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    merge_delta(updates.unionByName(inserts), t, on=["c_custkey"])
    return read_delta(spark, t)


@query(
    "table_profile",
    oracle="""
    SELECT 'l_returnflag' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_returnflag) AS n_nulls,
           COUNT(DISTINCT l_returnflag) AS n_distinct,
           CAST(MIN(l_returnflag) AS VARCHAR) AS min_value,
           CAST(MAX(l_returnflag) AS VARCHAR) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', COUNT(*), COUNT(*) - COUNT(l_linestatus),
           COUNT(DISTINCT l_linestatus),
           CAST(MIN(l_linestatus) AS VARCHAR), CAST(MAX(l_linestatus) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey', COUNT(*), COUNT(*) - COUNT(l_orderkey),
           COUNT(DISTINCT l_orderkey),
           CAST(MIN(l_orderkey) AS VARCHAR), CAST(MAX(l_orderkey) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
           COUNT(DISTINCT l_linenumber),
           CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR)
    FROM lineitem
    ORDER BY column_name
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling: per-column row/null/distinct counts and
    min/max, the summary a pipeline computes before trusting a new drop of
    data. The oracle spells it as 4 UNION ALL full scans; the Spark plan
    reads each BYTE once — one scan for the cheap streaming aggregates
    (count/min/max of every column in a single aggregate, then a
    zero-shuffle ``stack`` unpivot), plus one column-PRUNED scan per
    distinct count (N narrow scans whose bytes sum to one N-column
    scan).

    Why not one pass with multi-``countDistinct``: Catalyst rewrites N
    distinct aggregates in one Aggregate into an EXPAND that replicates
    every input row N+1 times before the shuffle — measured 8× slower
    than the split plan at sf0.1, and at 100 TB the expand multiplies
    the shuffle the same way. And why not one unpivoted (column, value)
    explode for all the distincts together: the explode materializes
    rows × columns structs (240 M at sf10) before the partial dedup can
    collapse anything — measured ~4 s at sf10 vs ~1 s for this form. The
    distinct counts instead run as one single-distinct aggregate PER
    column over a column-PRUNED scan: total bytes read across the N
    narrow scans equal one N-column scan, each partial aggregate
    collapses to the per-partition distinct values of its own column
    before its shuffle, and no row is ever replicated. Values stay in
    their native types end-to-end; min/max are cast to string only in the
    final 4-row projection, exactly as the oracle casts them.
    """
    cols = ["l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber"]
    li = load_table(spark, sf_dir, "lineitem").select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"cnt_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows, n_rows - cnt_{c}, min_{c}, max_{c}" for c in cols
    )
    prof = one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, min_value, max_value)"
    )
    from functools import reduce

    nd = reduce(
        lambda a, b: a.unionByName(b),
        [
            li.select(c).agg(
                F.lit(c).alias("column_name"),
                F.count_distinct(c).alias("n_distinct"),
            )
            for c in cols
        ],
    )
    # LEFT join + COALESCE 0: on an EMPTY table the base aggregate still
    # yields one row per column (stack of zero counts) while the distinct
    # frame is empty — an inner join would wrongly return zero rows where
    # the UNION ALL oracle returns one per column.
    return (
        prof.join(F.broadcast(nd), "column_name", "left")
        .withColumn("n_distinct", F.coalesce("n_distinct", F.lit(0)))
        .select(
            "column_name", "n_rows", "n_nulls", "n_distinct",
            "min_value", "max_value",
        )
        .orderBy("column_name")
    )


@query(
    "delta_restore",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def delta_restore_q(spark, sf_dir):
    """RESTORE TO VERSION AS OF — the lakehouse undo: commit customer
    (v0), clobber it with a bad overwrite (v1), restore to v0 (v2, a
    metadata-only commit replaying v0's add actions — no data rewrite),
    and read the restored state. The oracle is simply the original
    customer aggregate: if restore resurrects the wrong file set or the
    wrong schema, the segment histogram diverges."""
    import tempfile

    from delta_unity_duckdb_spark.sources.delta_log import (
        read_delta,
        restore_delta,
        write_delta,
    )
    from delta_unity_duckdb_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    t = tempfile.mkdtemp(prefix="delta_restore_")
    write_delta(cust, t)  # v0
    write_delta(
        cust.filter(F.col("c_custkey") % 100 == 0).withColumn(
            "c_mktsegment", F.lit("CORRUPTED")
        ),
        t,
        mode="overwrite",
    )  # v1: the bad write
    restore_delta(spark, t, 0)  # v2
    return (
        read_delta(spark, t)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


@query(
    "delta_schema_evolution",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CASE WHEN c_custkey % 10 = 0 THEN c_nationkey END AS c_nationkey
    FROM customer
    WHERE c_custkey % 5 = 0 ORDER BY c_custkey LIMIT 500
    """,
)
def delta_schema_evolution_q(spark, sf_dir):
    """Append-time schema evolution (Delta mergeSchema): v0 commits two
    columns, v1 appends rows carrying a NEW third column with
    ``merge_schema=True`` — the table schema widens in the same commit and
    v0's files backfill NULL on read, no rewrite. The oracle reconstructs
    the same union: every-5th customer, with nationkey only on the
    every-10th rows that arrived after the evolution."""
    import tempfile

    from delta_unity_duckdb_spark.sources.delta_log import read_delta, write_delta
    from delta_unity_duckdb_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    t = tempfile.mkdtemp(prefix="delta_evolve_")
    base = cust.filter((F.col("c_custkey") % 5 == 0) & (F.col("c_custkey") % 10 != 0))
    write_delta(base.select("c_custkey", "c_acctbal"), t)  # v0: two columns
    evolved = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    write_delta(evolved, t, merge_schema=True)  # v1: third column appears
    return read_delta(spark, t).orderBy("c_custkey").limit(500)


@query(
    "cohort_retention",
    oracle="""
    WITH o AS (
      SELECT o_custkey, DATE_TRUNC('month', CAST(o_orderdate AS TIMESTAMP)) AS m
      FROM orders),
    withc AS (
      SELECT o_custkey, m, MIN(m) OVER (PARTITION BY o_custkey) AS cohort_month
      FROM o),
    activity AS (
      SELECT DISTINCT o_custkey, cohort_month,
             DATEDIFF('month', cohort_month, m) AS months_since
      FROM withc)
    SELECT CAST(cohort_month AS DATE) AS cohort_month,
           CAST(months_since AS BIGINT) AS months_since,
           COUNT(*) AS active_customers
    FROM activity GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 500
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers bucketed by first-order month,
    counted as active in each subsequent month — the standard
    product-analytics retention triangle. The per-customer first month
    comes from a window MIN over the SAME custkey partitioning the
    dedup then reuses — one shuffle on o_custkey end-to-end before the
    small (cohort, month) rollup; no agg-then-join-back second pass over
    the fact table. months_since is an exact integer because both sides
    are month-truncated."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    w = Window.partitionBy("o_custkey")
    activity = (
        o.withColumn("cohort_month", F.min("m").over(w))
        .select(
            "o_custkey",
            "cohort_month",
            F.months_between("m", "cohort_month").cast("bigint").alias("months_since"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.col("cohort_month").cast("date").alias("cohort_month"), "months_since"
        )
        .agg(F.count(F.lit(1)).alias("active_customers"))
        .orderBy("cohort_month", "months_since")
        .limit(500)
    )


@query(
    "basket_pairs",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS x, b.l_partkey AS y
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    pc AS (SELECT x, y, COUNT(*) AS support FROM pairs GROUP BY x, y),
    single AS (SELECT l_partkey, COUNT(*) AS n_orders FROM li GROUP BY l_partkey)
    SELECT pc.x, pc.y, pc.support,
           (pc.support * 1000000) // sx.n_orders AS confidence_x_ppm
    FROM pc JOIN single sx ON pc.x = sx.l_partkey
    WHERE pc.support >= 3
    ORDER BY pc.support DESC, pc.x, pc.y LIMIT 100
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: co-purchased part pairs with order-level
    support and confidence(x→y) in integer ppm — the association-rule
    first pass. ONE shuffle folds lineitem into per-order baskets
    (``collect_set`` dedups in the partial aggregate, so the exchange
    moves one set per order, not one row per lineitem). The basket frame
    then re-explodes to deduped (order, part) rows that are STILL
    hash-partitioned on l_orderkey — so the pair self-join needs no new
    exchange (sort-only SortMergeJoin over the reused shuffle output;
    quadratic only in basket size, never in table size), and the
    per-part order counts read the same reused stage. Vs the previous
    distinct+self-join form this removes two full-data exchanges; vs a
    pure array-domain pair lambda it keeps pair generation inside
    whole-stage codegen (interpreted higher-order transforms measured
    ~40% slower on the same pairs at sf1). The support>=3 cut applies
    BEFORE the confidence join, so the rare-pair long tail never
    shuffles twice."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    ex = baskets.select("l_orderkey", F.explode("ps").alias("l_partkey"))
    a, b = ex.alias("a"), ex.alias("b")
    pc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )
    single = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        pc.join(single, pc.x == single.l_partkey)
        .select(
            "x",
            "y",
            "support",
            F.expr("(support * 1000000) div n_orders").alias("confidence_x_ppm"),
        )
        .orderBy(F.desc("support"), "x", "y")
        .limit(100)
    )


@query(
    "skyline_pareto",
    oracle="""
    WITH pts AS (SELECT DISTINCT p_retailprice AS x, p_size AS y FROM part)
    SELECT x, y FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y))
    ORDER BY x, y
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline of parts (minimize price AND size) — the
    multi-criteria "best tradeoffs" operator from the skyline-query
    literature (PAPERS.md, EDBT 2023). The oracle is the quadratic
    NOT EXISTS dominance self-join; the Spark plan is the linear
    two-phase bucket/prefix-min shape in operators/skyline.py — no
    self-join at any scale."""
    from delta_unity_duckdb_spark.operators.skyline import skyline2d

    p = load_table(spark, sf_dir, "part")
    return skyline2d(p, "p_retailprice", "p_size").orderBy("x", "y")


@query(
    "incremental_agg_refresh",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_value,
           COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def incremental_agg_refresh(spark, sf_dir):
    """Incremental materialized-view maintenance: customer lands in a
    Delta table across THREE separate commits; after each, the
    materialized per-segment SUM/COUNT is refreshed by aggregating ONLY
    that commit's rows (append-only CDC) and merging into the exact-
    DECIMAL state. The returned final state must equal a from-scratch
    aggregate over the full table — which is exactly the oracle. Refresh
    cost is proportional to the new commit, not the table
    (operators/incremental.py); the reference re-read everything every
    sync (delta_to_postgres_scd.py:51-105)."""
    import tempfile

    from delta_unity_duckdb_spark.operators.incremental import (
        read_materialized_agg,
        refresh_incremental_agg,
    )
    from delta_unity_duckdb_spark.sources.delta_log import write_delta
    from delta_unity_duckdb_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    src = tempfile.mkdtemp(prefix="inc_src_")
    state = tempfile.mkdtemp(prefix="inc_state_")
    for part in range(3):
        write_delta(cust.filter(F.col("c_custkey") % 3 == part), src)
        refresh_incremental_agg(
            spark, src, state, keys=["c_mktsegment"], sum_col="c_acctbal"
        )
    return (
        read_materialized_agg(spark, state, ["c_mktsegment"])
        .orderBy("c_mktsegment")
    )


@query(
    "winsorized_stats",
    oracle="""
    WITH bounds AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag),
    clipped AS (
      SELECT l.l_returnflag,
             LEAST(GREATEST(l.l_extendedprice, b.lo), b.hi) AS cv
      FROM lineitem l JOIN bounds b USING (l_returnflag))
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(cv AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS winsorized_sum,
           ROUND(MIN(cv), 4) AS clip_lo, ROUND(MAX(cv), 4) AS clip_hi
    FROM clipped GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregation — the outlier-robust cleaning step: clip
    each value to its group's [p05, p95] band, then aggregate the clipped
    column in exact DECIMAL. Percentile bounds are a tiny per-group frame
    (one row per returnflag) that BROADCASTS back onto the fact scan, so
    the clip is a map-side expression — the fact table shuffles once for
    the bounds aggregate and once for the final rollup, never for the
    join. Both engines use PERCENTILE_CONT linear interpolation on
    identical doubles — via ``group_percentiles_exact`` (round 9): the
    built-in ``percentile`` ImperativeAggregate was 1.9 s of this
    query's 2.3 s at sf0.1; the histogram+window form computes
    bit-identical bounds in codegen. LEFT join keeps the built-in's
    NULL-bounds behavior for a group with no non-NULL prices (LEAST/
    GREATEST skip NULLs ⇒ cv = raw price)."""
    from delta_unity_duckdb_spark.functions.numeric import group_percentiles_exact

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    bounds = group_percentiles_exact(
        li, ["l_returnflag"], "l_extendedprice", [0.05, 0.95], ["lo", "hi"]
    )
    cv = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag", "left")
        .select("l_returnflag", cv.alias("cv"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("cv")).cast("decimal(38,6)").alias("winsorized_sum"),
            F.round(F.min("cv"), 4).alias("clip_lo"),
            F.round(F.max("cv"), 4).alias("clip_hi"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------- C: LATERAL join
@query(
    "lateral_topn_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
           t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey LIMIT 500
    """,
)
def lateral_topn_join(spark, sf_dir):
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    modern-SQL top-N-per-group idiom the reference's DuckDB passthrough
    accepts verbatim. Spark's Catalyst decorrelates the lateral into a
    join + per-group rank (no per-customer re-execution), which is the
    plan a hand-written window query would produce — declarative parity
    with zero imperative code."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey LIMIT 500
        """
    )


# ---------------------------------------------------------------- C: distribution windows
@query(
    "window_percent_cume",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTH_VALUE(o_totalprice, 2) OVER
             (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_lowest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, o_totalprice, o_orderkey LIMIT 400
    """,
)
def window_percent_cume(spark, sf_dir):
    """Distribution-position window functions (PERCENT_RANK / CUME_DIST /
    NTH_VALUE with an unbounded frame) — the remaining window family the
    full-SQL surface exposes. percent_rank is (rank−1)/(n−1): one exact
    integer division per row, rounded identically on both engines; the
    unique (price, key) ordering removes tie ambiguity."""
    o = _t(spark, sf_dir, "orders")
    # NULLS LAST explicitly: DuckDB's plain ASC defaults to NULLS LAST
    # while Spark's defaults to NULLS FIRST — on NULL-bearing price data
    # the two engines would rank DIFFERENT rows (adversarial-values
    # sweep: NTH_VALUE(…, 2) picked a NULL on the Spark side).
    price_asc = F.col("o_totalprice").asc_nulls_last()
    w = Window.partitionBy("o_orderpriority").orderBy(price_asc, "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.nth_value("o_totalprice", 2).over(wfull).alias("second_lowest"),
        )
        # Sort by the RAW price (the oracle's order), not the rounded
        # pct_rank: beyond ~2M rows/partition adjacent ranks round to the
        # same 6-decimal value and the two engines could pick different
        # rows at the LIMIT boundary.
        .orderBy("o_orderpriority", price_asc, "o_orderkey")
        .limit(400)
    )


# ---------------------------------------------------------------- skew toolkit
@query(
    "salted_hot_key_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6))
             AS sum_l_quantity,
           CAST(COUNT(l_orderkey) AS BIGINT) AS count_l_orderkey,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_l_extendedprice,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_l_extendedprice
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def salted_hot_key_agg(spark, sf_dir):
    """The salting toolkit under oracle: l_returnflag has 3 values over
    the whole fact table — the textbook hot-key aggregation. The plan is
    the salted two-phase shape (phase 1 groups on (key, salt) so each
    hot key's rows spread over every scan task; phase 2 re-aggregates
    the tiny per-salt partials), realized by fx_sums with
    spark_partition_id as the deterministic salt. The oracle's SQL is
    the plain one-phase GROUP BY — the proof the 100 TB skew path is
    EXACTLY semantics-neutral for decomposable aggregates.

    Round-8 rework: the round-7 skew sweep flagged this 5.48× vs DuckDB
    and blamed "the blanket double exchange". Measured at sf100-skew,
    that diagnosis was wrong: the UNSALTED decimal plan costs the same
    (plain 14.2 s vs salted 13.1 s — map-side partial aggregation
    already shrinks both exchanges to ≤ keys·salts rows per task, so
    salting is ~free); the real 10 s was per-row BigDecimal work in
    CAST(double AS DECIMAL) + SUM(DECIMAL). The fix is the fixed-point
    ladder already proven on pricing_summary: l_quantity is integral
    (TPC-H: 1..50), so value·10⁴ sums exactly in int64 hi/lo words
    (fx_sums, functions/numeric.py) and min/max/count ride the same
    single scan as carried extras. 14.6 s → ~4 s at 600 M rows, values
    bit-identical (bounds-guarded; any out-of-domain row fails loudly
    rather than wrapping)."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums
    from delta_unity_duckdb_spark.sources.tables import column_nonnull_by_stats

    li = _t(spark, sf_dir, "lineitem")
    # COUNT(l_orderkey) ≡ COUNT(*) when the parquet footers prove the
    # column all-non-NULL — answer from metadata and skip decoding the
    # 600 M-row int64 entirely (the null-count pruning single-node
    # engines apply; worth ~1 s here, a whole column scan at 100 TB).
    if column_nonnull_by_stats(sf_dir, "lineitem", "l_orderkey"):
        cnt, carry = F.count(F.lit(1)), ["l_extendedprice"]
    else:
        cnt, carry = F.count("l_orderkey"), ["l_orderkey", "l_extendedprice"]
    out = fx_sums(
        li,
        ["l_returnflag"],
        {
            # exact: l_quantity ∈ [1, 50] integral doubles (TPC-H spec),
            # so q·10⁴ + 0.5 truncates to the decimal cast's unscaled long
            "sum_l_quantity": (
                F.expr("CAST(l_quantity * 10000 + 0.5d AS BIGINT)"),
                4,
            ),
        },
        extras={
            "count_l_orderkey": (cnt, "sum"),
            "min_l_extendedprice": (F.min("l_extendedprice"), "min"),
            "max_l_extendedprice": (F.max("l_extendedprice"), "max"),
        },
        bounds={"sum_l_quantity": (10_000, 500_000)},
        carry=carry,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_l_quantity").cast("decimal(38,6)").alias("sum_l_quantity"),
        F.col("count_l_orderkey").cast("bigint").alias("count_l_orderkey"),
        F.col("min_l_extendedprice").cast("double").alias("min_l_extendedprice"),
        F.col("max_l_extendedprice").cast("double").alias("max_l_extendedprice"),
    ).orderBy("l_returnflag")


@query(
    "key_skew_profile",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders), 6)
             AS share
    FROM orders GROUP BY o_orderpriority
    ORDER BY n_rows DESC, o_orderpriority LIMIT 10
    """,
)
def key_skew_profile_q(spark, sf_dir):
    """The pre-flight skew diagnostic (operators/skew.py
    key_skew_profile): per-key row counts and share of total, descending
    — the number you read before choosing broadcast vs salting vs AQE
    skew-join for a key. Exact integer ratio → double → round, identical
    on both engines."""
    from delta_unity_duckdb_spark.operators.skew import key_skew_profile

    o = _t(spark, sf_dir, "orders")
    prof = key_skew_profile(o, ["o_orderpriority"], top=10)
    return prof.select(
        "o_orderpriority",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "share",
    ).orderBy(F.desc("n_rows"), "o_orderpriority")
