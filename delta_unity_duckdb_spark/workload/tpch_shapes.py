"""Deeper TPC-H-shaped query coverage (SURVEY.md §2-C passthrough surface).

The reference delegates arbitrary SQL to DuckDB (delta-unity-duckdb.js:331-339,
README.md:132-141); these queries exercise the decision-support shapes a user
of that passthrough would realistically run — correlated EXISTS, left-join
count distributions, HAVING over grouped sums, scalar-subquery filters,
multi-dimension 6-table joins, full analytic-window inventory, and an
interval (range) join — each with a DuckDB oracle twin.

Scale notes per query are inline; the shared principles: dimensions are
broadcast, facts shuffle at most once on their natural key, and every
LIMIT is preceded by a total order on a unique key (hash determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.numeric import (
    DEC38,
    dec,
    dmoney,
    drate,
    dsum,
    sql_dsum,
)
from delta_unity_duckdb_spark.operators.rangejoin import interval_join
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))"
)


def _disc_price() -> F.Column:
    return dmoney("l_extendedprice") * (F.lit(1) - drate("l_discount"))


# ---------------------------------------------------------------- Q4 shape: correlated EXISTS + agg
@query(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS with an extra inequality.

    Spark plan: LEFT SEMI join on l_orderkey with the non-equi conjunct as
    join condition — one shuffle on the order key, semi-join short-circuits
    per-key (no row multiplication), then a partial+final hash agg on the
    low-cardinality priority column.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, on=cond, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------- Q13 shape: outer-join count distribution
@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join with a pushed non-key predicate,
    then a two-level aggregation (count per customer → histogram of counts).

    Scale: the orders-side filter prunes before the shuffle; first agg
    shuffles on c_custkey (same key as the join — AQE coalesces), second
    agg is over tiny cardinality (distinct counts). COUNT(o_orderkey)
    counts non-null keys only, preserving zero-order customers.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT")
    per_cust = (
        c.join(o, on=cond, how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------- Q15 shape: scalar-max subquery over a CTE
@query(
    "top_supplier_revenue",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: per-supplier revenue CTE reused twice (join input +
    scalar MAX subquery).

    Spark: compute the CTE once as a DataFrame; the MAX side collapses to a
    single row and is broadcast into an equality filter — no second scan of
    lineitem, no sort. Revenue is exact DECIMAL so the MAX-equality
    predicate is engine-portable (a double sum here could disagree in the
    last ulp and select a different supplier).
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast(DEC38).alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        revenue.join(F.broadcast(best), revenue.total_revenue == best.best_revenue)
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------- Q18 shape: HAVING over grouped sum + 3-way join
@query(
    "large_volume_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM (
      SELECT l_orderkey, {sql_dsum("l_quantity", "sum_qty")}
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    ) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-then-filter (HAVING) drives a selective
    3-way join.

    Scale: the HAVING collapses lineitem to a handful of hot orders BEFORE
    any join — the surviving set is small enough to broadcast into orders,
    and the orders→customer join is dimension-broadcast too, so the only
    shuffle is the initial groupBy(l_orderkey). TakeOrderedAndProject caps
    the result without a global sort.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------- Q22 shape: scalar-avg filter + NOT EXISTS
@query(
    "idle_rich_customers",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                                    / COUNT(*), 6)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average account balance (scalar subquery) and
    no orders (anti join), grouped by nation.

    Spark: the scalar average collapses to one broadcast row; NOT EXISTS is
    a LEFT ANTI join shuffling on the customer key. The average is computed
    decimal-exact then rounded (functions/numeric.py) so the `>` boundary
    is identical in both engines.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_bal")
        )
    )
    rich = c.join(F.broadcast(avg_bal), c.c_acctbal > F.col("avg_bal")).drop("avg_bal")
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# ---------------------------------------------------------------- Q7 shape: 6-table volume shipping
@query(
    "nation_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DECIMAL(38,6)) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {_SQL_DISC_PRICE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by year —
    the widest join tree in the suite (lineitem ⋈ orders ⋈ customer ⋈
    supplier ⋈ nation ⋈ nation).

    Scale: supplier/customer/nation are broadcast (no shuffle); the nation
    filters prune suppliers and customers BEFORE touching the facts, so
    lineitem and orders are each reduced by the filter's selectivity
    (~2/25² of pairs) ahead of the one fact-fact shuffle on the order key.
    The final agg has ~2·years groups.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))

    supp = s.join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
    cust = c.join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))

    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast(DEC38).alias("revenue"))
    )


# ---------------------------------------------------------------- analytic windows: ntile / percent_rank / cume_dist
@query(
    "window_ntile_stats",
    oracle="""
    SELECT c_custkey, c_nationkey,
           NTILE(4)      OVER w AS quartile,
           CAST(FLOOR(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS pct_rank_e6,
           CAST(FLOOR(CUME_DIST()    OVER w * 1000000) AS BIGINT) AS cume_e6
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_stats(spark, sf_dir):
    """Distribution-analytic windows (NTILE/PERCENT_RANK/CUME_DIST) —
    passthrough-surface parity. The window order includes the unique
    c_custkey so tie rows get a deterministic total order (NTILE assigns
    by position, so ties would otherwise be engine-dependent). One shuffle
    on c_nationkey; per-partition sort only.

    Fractions are exported FLOOR-quantized to 1e-6 (not ROUNDed): the
    underlying doubles are bit-identical across engines, but ROUND's
    half-way tie-break is not — at sf0.1 a rank fraction landed exactly on
    a .5 boundary and the engines rounded opposite ways.
    """
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.floor(F.percent_rank().over(w) * 1000000).cast("long").alias("pct_rank_e6"),
        F.floor(F.cume_dist().over(w) * 1000000).cast("long").alias("cume_e6"),
    )


# ---------------------------------------------------------------- analytic windows: first/last/nth over full frame
@query(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark, sf_dir):
    """FIRST_VALUE/LAST_VALUE/NTH_VALUE over an explicit unbounded frame.

    The frame spec matters: the SQL-default frame (UNBOUNDED PRECEDING →
    CURRENT ROW) makes LAST_VALUE degenerate; pinning both ends gives the
    per-customer first/last/second order price. Deterministic via the
    unique o_orderkey tiebreak.
    """
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# ---------------------------------------------------------------- interval (range) join
@query(
    "interval_join_events",
    oracle="""
    SELECT a.event_id,
           COUNT(*) AS n_clicks,
           CAST(SUM(CAST(b.value AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS click_value
    FROM events a JOIN events b
      ON b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'purchase' AND b.event_type = 'click'
    GROUP BY a.event_id
    """,
)
def interval_join_events(spark, sf_dir):
    """Range join: clicks landing in the 5 minutes after each purchase.

    DuckDB plans the BETWEEN predicate as an IEJoin; Spark would fall back
    to an O(n²) nested-loop broadcast. operators/rangejoin.py instead
    discretizes time into 5-minute buckets: intervals explode to ≤2
    buckets, points map to exactly one, and the join becomes a plain hash
    equi-join plus an exact refinement filter — linear shuffle, AQE-
    partitionable, no duplicate pairs by construction.

    Eager aggregation below the join (Yan & Larson style), both sides —
    the round-7 sf100 lesson: under heavy duplication the pair
    INTERMEDIATE is Θ(dup²) per timestamp even though the aggregate
    output is linear (the 1000×-replicated fixture timed out at >600 s
    with raw pairs; DuckDB's IEJoin needed 333 s). The aggregate only
    needs per-click (count, sum) and is keyed by the purchase WINDOW,
    so: collapse clicks to distinct c_ts with (cnt, sum) first, collapse
    purchases to distinct windows, range-join the two collapsed frames,
    roll up per window, and join the per-window answer back to purchase
    event_ids with one broadcast-or-shuffle equi-join. Exact for any
    data (count/sum are decomposable); pair volume drops from
    |purchases|·|clicks-in-window| to |distinct ts|² locally.
    """
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").alias("w_start")
    )
    anchors = (
        purchases.groupBy("w_start")
        .agg(F.count(F.lit(1)).alias("_na"))
        .select(
            "w_start",
            (F.col("w_start") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
        )
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(F.col("ts").alias("c_ts"), dec("value").alias("v"))
        .groupBy("c_ts")
        .agg(F.count(F.lit(1)).alias("c_cnt"), F.sum("v").alias("c_sum"))
    )
    pairs = interval_join(
        anchors, clicks, start="w_start", end="w_end", ts="c_ts",
        bucket_width_seconds=300,
    )
    per_window = pairs.groupBy("w_start").agg(
        F.sum("c_cnt").alias("n_clicks"),
        F.sum("c_sum").alias("_sum_value"),
    )
    return purchases.join(per_window, "w_start").select(
        "event_id",
        "n_clicks",
        F.col("_sum_value").cast("decimal(38,6)").alias("click_value"),
    )


# ---------------------------------------------------------------- moment statistics from exact sums
# Casts are asymmetric-widened (19,4)/(13,4) so DuckDB's multiply picks its
# int128 path (its int64 fast path overflows on price²); values are exact
# either way, so Spark may keep narrower widths.
_MOMENT_SUMS_SQL = """
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(9,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(13,4)) * CAST(l_quantity AS DECIMAL(13,4))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(13,4)) * CAST(l_quantity AS DECIMAL(13,4))
                      * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx3,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(13,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
"""


@query(
    "stats_moments",
    oracle=f"""
    SELECT l_returnflag, n,
           ROUND((sx2 - sx * sx / n) / (n - 1), 6) AS var_qty,
           ROUND(SQRT((sx2 - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
           ROUND((sx3 / n - 3 * (sx / n) * (sx2 / n) + 2 * (sx / n) * (sx / n) * (sx / n))
                 / POW(sx2 / n - (sx / n) * (sx / n), 1.5), 6) AS skew_qty,
           ROUND((sxy - sx * sy / n)
                 / SQRT((sx2 - sx * sx / n) * (sy2 - sy * sy / n)), 6) AS corr_qty_price
    FROM ({_MOMENT_SUMS_SQL})
    """,
)
def stats_moments(spark, sf_dir):
    """Distribution statistics (variance/stddev/skewness/correlation) via
    the single-pass moment-sketch pattern: accumulate exact DECIMAL power
    sums (associative — safe under any partitioning), then evaluate the
    closed-form moments on the tiny grouped result.

    Built-in stddev/skewness/corr aggregate in floating point, which is
    partition-order-dependent AND definition-divergent across engines;
    exact sums make the same formula text produce bit-identical doubles
    in both. One shuffle of 8 decimal accumulators per group.
    """
    from delta_unity_duckdb_spark.functions.numeric import fx_sums
    from delta_unity_duckdb_spark.sources.tables import load_table_cpu_bound

    li = load_table_cpu_bound(spark, sf_dir, "lineitem")
    # Scale-4 fixed point instead of per-row DECIMAL powers (x³ in
    # BigDecimal measured ~10× the oracle at sf10): the inputs are exact
    # at 4 decimals and nonnegative, so every power sum is an exact
    # int64-term sum at a known scale — fx_sums reassembles the exact
    # decimal values, and the final double casts match the oracle's
    # CAST(SUM(DECIMAL…) AS DOUBLE) bit-for-bit. Per-row bounds: q4³ ≤
    # 1.25e17, p4² ≤ 1.2e18 — inside int64 with ≥7× headroom.
    q4 = F.expr("CAST(l_quantity * 10000 + 0.5d AS BIGINT)")
    p4 = F.expr("CAST(l_extendedprice * 10000 + 0.5d AS BIGINT)")
    sums = fx_sums(
        li,
        ["l_returnflag"],
        {
            "fsx": (q4, 4),
            "fsx2": (q4 * q4, 8),
            "fsx3": (q4 * q4 * q4, 12),
            "fsy": (p4, 4),
            "fsy2": (p4 * p4, 8),
            "fsxy": (q4 * p4, 8),
        },
        extras={"n": F.count(F.lit(1))},
        # Enforce the documented preconditions per-row (cheap codegen'd
        # comparisons): nonnegativity (the +0.5d recipe truncates toward
        # zero on negatives) and tight int64 headroom for the cubes —
        # data 20× beyond TPC-H domain raises loudly instead of wrapping.
        bounds={
            "fsx": (0, 10**7),
            "fsx2": (0, 10**14),
            "fsx3": (0, 2 * 10**18),
            "fsy": (0, 4 * 10**10),
            "fsy2": (0, 4 * 10**18),
            "fsxy": (0, 4 * 10**17),
        },
    ).select(
        "l_returnflag",
        "n",
        *[
            F.col(f"f{c}").cast("double").alias(c)
            for c in ("sx", "sx2", "sx3", "sy", "sy2", "sxy")
        ],
    )
    n, sx, sx2, sx3 = F.col("n"), F.col("sx"), F.col("sx2"), F.col("sx3")
    sy, sy2, sxy = F.col("sy"), F.col("sy2"), F.col("sxy")
    m = sx / n
    return sums.select(
        "l_returnflag",
        "n",
        F.round((sx2 - sx * sx / n) / (n - 1), 6).alias("var_qty"),
        F.round(F.sqrt((sx2 - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round(
            (sx3 / n - 3 * m * (sx2 / n) + 2 * m * m * m)
            / F.pow(sx2 / n - m * m, 1.5),
            6,
        ).alias("skew_qty"),
        F.round(
            (sxy - sx * sy / n) / F.sqrt((sx2 - sx * sx / n) * (sy2 - sy * sy / n)), 6
        ).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------- bitwise aggregates
@query(
    "bitwise_aggs",
    oracle="""
    SELECT l_returnflag,
           BIT_AND(l_linenumber) AS lines_and,
           BIT_OR(l_linenumber)  AS lines_or,
           BIT_XOR(l_linenumber) AS lines_xor,
           BOOL_AND(l_quantity > 0) AS all_positive,
           BOOL_OR(l_discount > 0.09) AS any_high_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def bitwise_aggs(spark, sf_dir):
    """Bitwise/boolean aggregates (passthrough surface) — associative and
    exact, so they distribute with plain partial aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("lines_and"),
        F.bit_or("l_linenumber").alias("lines_or"),
        F.bit_xor("l_linenumber").alias("lines_xor"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_disc"),
    )


# ---------------------------------------------------------------- series generator (table function)
@query(
    "series_generate",
    oracle="""
    SELECT CAST(i % 7 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM((i * i) % 97) AS BIGINT) AS checksum
    FROM generate_series(0, 999999) t(i)
    GROUP BY 1
    """,
)
def series_generate(spark, sf_dir):
    """Synthetic-range table function (DuckDB generate_series ≡
    spark.range) — the engine can originate data, not only scan it.
    spark.range parallelizes the range across the cluster with no input
    IO; exact integer arithmetic end-to-end."""
    i = F.col("id")
    return (
        spark.range(0, 1_000_000)
        .groupBy((i % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((i * i) % 97).alias("checksum"),
        )
    )


# ---------------------------------------------------------------- QUALIFY shape: top-n per group
@query(
    "topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 2
    """,
)
def topn_per_group(spark, sf_dir):
    """Top-2 orders per customer — DuckDB's QUALIFY sugar, Spark's
    window+filter. One shuffle on the group key; the rank filter prunes
    before anything downstream."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------- mode aggregate (deterministic)
@query(
    "mode_agg",
    oracle="""
    SELECT o_orderstatus, priority_mode, n FROM (
      SELECT o_orderstatus, o_orderpriority AS priority_mode, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority)
    WHERE rn = 1
    """,
)
def mode_agg(spark, sf_dir):
    """Most-frequent value per group. Built-in MODE() leaves ties
    engine-defined; count + rank with an explicit tie-break is
    deterministic everywhere. Two-level: count shuffle on the pair key,
    then a window over the (tiny) grouped result."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), "o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("priority_mode"), "n"
        )
    )


# ---------------------------------------------------------------- edit distance
@query(
    "string_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, p_type) AS brand_type_dist,
           levenshtein(p_name, p_brand) AS name_brand_dist
    FROM part ORDER BY p_partkey LIMIT 500
    """,
)
def string_distance(spark, sf_dir):
    """Levenshtein edit distance (fuzzy matching surface). Per-row scalar —
    whole-stage codegen, embarrassingly parallel, no shuffle."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
            F.levenshtein("p_name", "p_brand").alias("name_brand_dist"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


# ---------------------------------------------------------------- calendar breakdown
@query(
    "calendar_breakdown",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           EXTRACT(month FROM o_orderdate) AS mth,
           EXTRACT(week FROM o_orderdate) AS iso_week,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS total
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def calendar_breakdown(spark, sf_dir):
    """Calendar-hierarchy rollup (year/quarter/month/ISO week). Extraction
    is codegen'd scalar work; one shuffle on the composite calendar key.
    ISO week is the one field both engines define identically (dayofweek
    origins differ — deliberately excluded)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mth"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "total"),
        )
    )


# ---------------------------------------------------------------- RANGE frame over event time
@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,6)) AS trailing_30d_spend
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """Trailing 30-day spend per customer — a RANGE (value-based) frame,
    the time-series staple ROWS frames can't express (peers with equal
    order keys must aggregate together; gaps must count as time).

    Spark's rangeBetween is numeric-only, so the order key is the epoch
    second and the frame is ±seconds — semantically identical to DuckDB's
    INTERVAL frame over the timestamp. Exact DECIMAL sums keep the frame
    aggregation order-independent. One shuffle on o_custkey.
    """
    o = _t(spark, sf_dir, "orders")
    epoch = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast(DEC38)
        .alias("trailing_30d_spend"),
    )


# ---------------------------------------------------------------- equi-width histogram
@query(
    "histogram_bins",
    oracle="""
    SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - 0.0) / 2500.0), 0), 19) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS total
    FROM orders GROUP BY 1
    """,
)
def histogram_bins(spark, sf_dir):
    """Equi-width histogram (20 bins of 2500 over order totals) — the
    profile/EDA shape. The bin expression is written identically in both
    engines (no width_bucket in DuckDB): floor((v-lo)/w) clamped to
    [0, n-1]. Codegen scalar + one low-cardinality shuffle."""
    o = _t(spark, sf_dir, "orders")
    bin_col = (
        F.least(
            F.greatest(F.floor((F.col("o_totalprice") - 0.0) / 2500.0), F.lit(0)),
            F.lit(19),
        )
        .cast("long")
        .alias("bin")
    )
    return o.groupBy(bin_col).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "total"),
    )


# ---------------------------------------------------------------- stratified deterministic sample
@query(
    "stratified_sample",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n, {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem
    WHERE l_orderkey % 13 = 0
    GROUP BY l_returnflag
    """,
)
def stratified_sample(spark, sf_dir):
    """Per-stratum systematic sample (1-in-13 by key modulus) with
    per-group verification aggregates. Deterministic and engine-portable
    where RNG-based sampleBy is not; at 100 TB the modulus filter pushes
    into the scan and the sample never materializes centrally."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 13 == 0)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------- Q6 shape: predicate-band revenue
@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                    * CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: tight multi-predicate scan + two-column product
    aggregate. No joins, no groups — the whole query is one codegen'd
    scan stage whose date/discount/quantity predicates all push into the
    parquet reader (PushedFilters), then a single-row exact-decimal agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dmoney("l_extendedprice") * drate("l_discount"))
            .cast(DEC38)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------- Q10 shape: returned-item top customers
@query(
    "returned_item_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue last half-year.

    Scale: the date filter prunes orders BEFORE the fact-fact join; the
    returnflag filter prunes lineitem at the scan; customer and nation
    broadcast. One shuffle on the order key, agg on the customer key,
    TakeOrdered for the top 20 (exact DECIMAL revenue makes the ranking
    engine-stable)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    o_f = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li_f = li.filter(F.col("l_returnflag") == "R")
    return (
        li_f.join(o_f, li_f.l_orderkey == o_f.o_orderkey)
        .join(F.broadcast(c), o_f.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast(DEC38).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------- Q14 shape: promo revenue share
@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_DISC_PRICE} END) AS DECIMAL(38,6)) AS promo_revenue,
           CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional vs total revenue over a dim join.
    Exports numerator and denominator as exact DECIMALs instead of the
    textbook percentage — the division would re-introduce double rounding
    (see functions/numeric.py); consumers divide at display time. Part is
    broadcast; single scan, single agg row."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    dp = _disc_price()
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", dp)).cast(DEC38).alias("promo_revenue"),
            F.sum(dp).cast(DEC38).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------- Q19 shape: disjunctive join predicate
@query(
    "disjunctive_band_revenue",
    oracle=f"""
    SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def disjunctive_band_revenue(spark, sf_dir):
    """TPC-H Q19 shape: an OR of conjunctive bands spanning both join
    sides. Catalyst extracts the common constraints (p_brand IN (...),
    l_quantity range) as pushable pre-join filters and keeps the full
    disjunction as the post-join residual — the filter-extraction test
    every optimizer must pass. Part broadcasts; one scan each side."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    band = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(
        F.sum(_disc_price()).cast(DEC38).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------- Q21 shape: EXISTS + NOT EXISTS on the same fact
@query(
    "sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT a.l_suppkey AS s_suppkey, COUNT(DISTINCT a.l_orderkey) AS numwait
    FROM li a
    WHERE a.l_shipdate > a.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM li b
                  WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li c
                      WHERE c.l_orderkey = a.l_orderkey AND c.l_suppkey <> a.l_suppkey
                        AND c.l_shipdate > c.o_orderdate + INTERVAL 90 DAY)
    GROUP BY a.l_suppkey
    """,
)
def sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order — EXISTS and NOT EXISTS correlated on the same
    fact table (lateness = shipped >90 days after order date).

    Spark plan: one shared li⋈orders projection, then a LEFT SEMI join
    (other-supplier exists) and a LEFT ANTI join (no other LATE supplier)
    both keyed on l_orderkey — three shuffles on the same key, which AQE
    coalesces; no row explosion because semi/anti short-circuit per key.
    COUNT(DISTINCT orderkey) guards against multi-line orders counting
    twice.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "is_late"
        ),
    )
    late = joined.filter(F.col("is_late"))
    other = joined.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_suppkey").alias("b_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("c_orderkey"), F.col("l_suppkey").alias("c_suppkey")
    )
    return (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("l_suppkey") != F.col("b_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("c_orderkey"))
            & (F.col("l_suppkey") != F.col("c_suppkey")),
            "left_anti",
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


# ---------------------------------------------------------------- Q8 shape: market share
@query(
    "nation_market_share",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_SQL_DISC_PRICE} END) AS DECIMAL(38,6)) AS nation_volume,
           CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS total_volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_regionkey = 1
    GROUP BY 1
    """,
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of supply volume into a region,
    by year. The share is exported as exact numerator/denominator decimals
    (dividing would reintroduce the ROUND-on-double hazard). Customers are
    pre-filtered to the region via a broadcast nation join BEFORE touching
    facts; supplier nation rides a broadcast too — one fact-fact shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    cust_region = c.join(
        F.broadcast(n.filter(F.col("n_regionkey") == 1).select("n_nationkey")),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    dp = _disc_price()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_region), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", dp)).cast(DEC38).alias("nation_volume"),
            F.sum(dp).cast(DEC38).alias("total_volume"),
        )
    )


# ---------------------------------------------------------------- Q2 shape: argmin per group
@query(
    "min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, cost
    FROM (
      SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS best
      FROM ps)
    WHERE cost = best
    ORDER BY p_partkey, s_suppkey LIMIT 1000
    """,
)
def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: the cheapest supplier for every part (argmin per
    group, TPC-H's correlated `= (SELECT MIN ...)` pattern).

    Spark: window MIN over the part key + equality filter — ONE extra
    pass over the grouped result instead of a per-part correlated
    subquery (which would decorrelate into a self-join of the aggregate
    anyway). Both levels share the (partkey, suppkey) shuffle key; ties
    keep every minimal supplier, deterministically ordered for the LIMIT.
    Exact DECIMAL cost makes the equality engine-portable.
    """
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast(DEC38)
        .alias("cost")
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("best", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("best"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "cost",
        )
        .orderBy("p_partkey", "s_suppkey")
        .limit(1000)
    )


# ---------------------------------------------------------------- Q12 shape: dual conditional count by class
@query(
    "late_shipment_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
)
def late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes and order priority): one pass over
    the order⋈lineitem join, splitting counts by priority class with
    conditional aggregation. The fixtures lack l_shipmode/l_receiptdate
    (TESTDATA.md), so class = l_returnflag and "late" = shipped >30 days
    after order date (same non-equi residual as the original's
    receipt/commit comparison; cf. reference README.md:386 CASE-fusion
    guidance).

    Spark plan: both fact tables project only join keys + the two small
    columns before the one shuffle on the order key; conditional SUMs
    fuse into a single partial+final hash agg over a 3-row group space —
    at 100 TB the reduce side is a handful of rows per class regardless
    of input size.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------- Q9 shape: product-type profit by nation/year
@query(
    "product_profit_by_nation",
    oracle=f"""
    SELECT n_name AS supp_nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, 2
    """,
)
def product_profit_by_nation(spark, sf_dir):
    """TPC-H Q9 shape (product type profit): profit for one product family
    grouped by supplier nation and order year. The fixtures carry no
    partsupp/ps_supplycost (TESTDATA.md), so profit = discounted revenue —
    the join topology (part-name filter fanned across 4 joins) is the
    shape under test.

    Spark plan: the p_name LIKE filter cuts part to ~1/6 BEFORE any fact
    is touched; part and supplier⋈nation both ride broadcast hash joins,
    so lineitem shuffles exactly once — on l_orderkey against orders.
    At 100 TB the only exchanged data is the filtered fact, and the
    selective part filter is applied map-side (semi-join pushdown by
    broadcast), never after a shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("supp_nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(_disc_price()).cast(DEC38).alias("profit"))
    )


# ---------------------------------------------------------------- Q11 shape: fraction-of-total HAVING
@query(
    "important_part_value",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, value
    FROM v
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(SUM(value) AS DOUBLE) / COUNT(*) * 1.5 FROM v)
    ORDER BY value DESC, p_partkey LIMIT 200
    """,
)
def important_part_value(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): per-group value
    compared against a scalar fraction of the GLOBAL total — the
    grouped-HAVING-vs-scalar-subquery pattern. Fixtures have no partsupp,
    so value = summed extended price per part over lineitem.

    Spark plan: ONE grouped aggregation on l_partkey; the global total is
    a second aggregation over that (already tiny) grouped result, joined
    back by broadcast — the fact table is read and shuffled once, and the
    threshold compare runs map-side on the grouped rows. Both engines
    compute the threshold double from the same exact DECIMAL sums, so the
    boundary is bit-identical (numeric.py strategy). The threshold is
    1.5x the AVERAGE per-part value (not a fixed fraction of total):
    part cardinality grows with scale factor, so a fixed fraction would
    silently select nothing at higher SFs — this form is scale-free.
    """
    li = _t(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(DEC38).alias("value")
    )
    total = v.agg(
        (F.sum("value").cast("double") / F.count(F.lit(1)) * F.lit(1.5)).alias(
            "threshold"
        )
    )
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.desc("value"), "p_partkey")
        .limit(200)
    )


# ---------------------------------------------------------------- Q16 shape: NOT-IN + COUNT DISTINCT by attrs
@query(
    "supplier_count_by_part",
    oracle="""
    SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_type, p_size
    """,
)
def supplier_count_by_part(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each qualifying part class, excluding a blocklist of
    suppliers via NOT IN (the original's "customer complaints" exclusion
    → negative account balance here; partsupp → lineitem as the
    part-supplier bridge).

    Spark plan: all three part predicates prune a 2k-row dim that then
    BROADCASTs into the fact scan; the supplier blocklist is a broadcast
    LEFT ANTI join (s_suppkey is non-null, so anti ≡ NOT IN). The only
    shuffle is the final COUNT DISTINCT — Spark expands to a two-phase
    distinct-then-count keyed on (type, size, suppkey), which
    AQE-coalesces; no row ever carries more than three small columns.
    """
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_type", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------- Q20 shape: nested IN + grouped HAVING
@query(
    "promo_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 40)
    ORDER BY s_suppkey
    """,
)
def promo_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers with heavy
    shipped volume of one part family in one year — two nested IN
    subqueries feeding a grouped HAVING. The original compares against
    0.5*ps_availqty; with no partsupp the HAVING threshold is a constant,
    preserving the nesting shape.

    Spark plan: the part-family IN becomes a broadcast LEFT SEMI into the
    date-pruned fact scan (filter + semi both run map-side); one shuffle
    groups (suppkey, partkey); the surviving supplier keys are tiny and
    broadcast back as a SEMI join against the 100-row supplier dim.
    DECIMAL quantity sum keeps the HAVING boundary engine-portable.
    """
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    heavy = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------- grouped statistical outlier detection
@query(
    "price_outliers",
    oracle="""
    WITH cents AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CAST(FLOOR(o_totalprice * 100) AS DECIMAL(19,0)) AS c
      FROM orders),
    stats AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(c) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(c * c) AS DECIMAL(38,0)) AS s2
      FROM cents GROUP BY o_orderpriority)
    SELECT o_orderkey, o.o_orderpriority, o_totalprice
    FROM cents o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
    WHERE CAST(c AS DOUBLE) > CAST(s1 AS DOUBLE) / n
      AND (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
          * (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
          > 2.25 * (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
    ORDER BY o_orderkey
    """,
)
def price_outliers(spark, sf_dir):
    """Grouped z-score outlier detection: orders more than 1.5 standard
    deviations ABOVE their priority class's mean price (uniform-ish
    fixture data caps |z| at sqrt(3), so a 2-sigma cut would select
    nothing) — the anomaly-flagging pass of a monitoring pipeline.

    Scale design: mean/variance come from exact integer-cent power sums
    (numeric.py strategy — associative, partition-order-independent;
    FLOOR-quantized to cents so the square stays inside DECIMAL(38,0) —
    DECIMAL(19,0) forces int128 multiply in DuckDB, where a DECIMAL(18)
    square overflows its int64 fast path). Sums aggregate in ONE pass and
    broadcast back onto the fact scan, so the fact table is read twice
    but shuffled never; contrast a window formulation, which would sort
    every partition of the 100 TB fact by group. The z-test runs in
    doubles derived from those exact integers with the identical
    expression tree in both engines — IEEE arithmetic is deterministic,
    so the boundary cannot flip cross-engine.
    """
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    o = _t(spark, sf_dir, "orders").withColumn(
        "c", F.floor(F.col("o_totalprice") * 100).cast("long")
    )
    # Exact power sums via fx_sums int64 partials: a DECIMAL(19,0) per-row
    # column leaves Spark's compact-long decimal fast path (precision >18
    # = one JVM BigDecimal per row per multiply); the long c and c·c are
    # exact (cents ≤ ~6·10⁷, square ≤ 3.6·10¹⁵) and the two-phase merge
    # widens to decimal only on the few-row boundary.
    stats = fx_sums(
        o.select(F.col("o_orderpriority").alias("sp"), "c"),
        ["sp"],
        {
            "s1": (F.col("c"), 0),
            "s2": ((F.col("c") * F.col("c")).cast("long"), 0),
        },
        extras={"n": F.count(F.lit(1))},
        bounds={"s1": (0, 10**9), "s2": (0, 4 * 10**15)},
    ).select(
        "sp",
        "n",
        F.col("s1").cast("decimal(38,0)").alias("s1"),
        F.col("s2").cast("decimal(38,0)").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    ex2 = F.col("s2").cast("double") / F.col("n")
    x = F.col("c").cast("double")
    return (
        o.join(F.broadcast(stats), o.o_orderpriority == F.col("sp"))
        .filter((x > mean) & ((x - mean) * (x - mean) > 2.25 * (ex2 - mean * mean)))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------- ratio-to-report window
@query(
    "nation_revenue_share",
    oracle=f"""
    WITH nat AS (
      SELECT n_regionkey, n_name,
             CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_regionkey, n_name)
    SELECT n_name, revenue,
           CAST(FLOOR(CAST(revenue AS DOUBLE)
                / CAST(SUM(revenue) OVER (PARTITION BY n_regionkey) AS DOUBLE)
                * 1000000) AS BIGINT) AS share_ppm
    FROM nat ORDER BY n_name
    """,
)
def nation_revenue_share(spark, sf_dir):
    """Ratio-to-report: each nation's share of its REGION's supply revenue
    — the percent-of-total window shape (DuckDB/Oracle RATIO_TO_REPORT).

    Spark plan: the fact aggregates FIRST (one shuffle on the ~25-row
    nation key via a broadcast supplier⋈nation dim), and the window runs
    over the 25-row aggregate — never over fact rows. Share is
    FLOOR-quantized ppm from doubles derived off exact DECIMAL sums
    (numeric.py ROUND hazard rule).
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_regionkey", "n_name"
    )
    nat = (
        li.join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(_disc_price()).cast(DEC38).alias("revenue"))
    )
    w = Window.partitionBy("n_regionkey")
    return (
        nat.withColumn(
            "share_ppm",
            F.floor(
                F.col("revenue").cast("double")
                / F.sum("revenue").over(w).cast("double")
                * 1000000
            ).cast("long"),
        )
        .select("n_name", "revenue", "share_ppm")
        .orderBy("n_name")
    )


# ---------------------------------------------------------------- window COUNT(DISTINCT)
@query(
    "window_distinct_count",
    oracle="""
    SELECT supplier_breadth, COUNT(*) AS n_orders
    FROM (
        SELECT DISTINCT l_orderkey,
               COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
                 AS supplier_breadth
        FROM lineitem
    )
    GROUP BY supplier_breadth
    """,
)
def window_distinct_count(spark, sf_dir):
    """COUNT(DISTINCT) OVER (PARTITION BY …) — SQL feature Spark's window
    functions reject outright. Idiomatic re-expression: ``collect_set``
    over the partition (exact distinct set, hash-accumulated — no sort) and
    take its size. Here: per-order distinct-supplier breadth, folded to a
    histogram so the output stays scale-free while every row exercises the
    window.

    Scale: the window shuffles once on l_orderkey; set size is bounded by
    lines-per-order (≤7 in TPC-H), so state per key is O(1) — safe at
    any scale factor."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return (
        li.withColumn(
            "supplier_breadth", F.size(F.collect_set("l_suppkey").over(w))
        )
        .select("l_orderkey", "supplier_breadth")
        .distinct()
        .groupBy("supplier_breadth")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------- regression aggregates
@query(
    "regr_aggs",
    oracle=f"""
    WITH sums AS ({_MOMENT_SUMS_SQL})
    SELECT l_returnflag,
           n AS regr_count,
           CAST(FLOOR(((sxy - sx * sy / n) / (sx2 - sx * sx / n)) * 1000000)
                AS BIGINT) AS slope_u,
           CAST(FLOOR((sy / n - ((sxy - sx * sy / n) / (sx2 - sx * sx / n))
                       * sx / n) * 1000000) AS BIGINT) AS intercept_u,
           CAST(FLOOR(((sxy - sx * sy / n) * (sxy - sx * sy / n))
                      / ((sx2 - sx * sx / n) * (sy2 - sy * sy / n))
                      * 1000000) AS BIGINT) AS r2_u
    FROM sums
    """,
)
def regr_aggs(spark, sf_dir):
    """Linear-regression aggregates (REGR_SLOPE / REGR_INTERCEPT / REGR_R2 /
    REGR_COUNT) — built-ins in DuckDB/Postgres; on Spark, re-derived from
    the same single-pass exact-DECIMAL power sums as ``stats_moments``:
    associative partial aggregation (one shuffle of 6 accumulators per
    group, partition-order-independent), closed-form evaluation on the
    grouped scalars, FLOOR-quantized to micro-units for cross-engine hash
    stability (see functions.numeric ROUND hazard)."""
    from delta_unity_duckdb_spark.sources.tables import load_table_cpu_bound

    li = load_table_cpu_bound(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(9,4)")
    y = F.col("l_extendedprice").cast("decimal(12,4)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sx2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("sy2"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sx2 = F.col("n"), F.col("sx"), F.col("sx2")
    sy, sy2, sxy = F.col("sy"), F.col("sy2"), F.col("sxy")
    slope = (sxy - sx * sy / n) / (sx2 - sx * sx / n)
    intercept = sy / n - slope * sx / n
    r2 = ((sxy - sx * sy / n) * (sxy - sx * sy / n)) / (
        (sx2 - sx * sx / n) * (sy2 - sy * sy / n)
    )
    return sums.select(
        "l_returnflag",
        n.alias("regr_count"),
        F.floor(slope * 1000000).cast("long").alias("slope_u"),
        F.floor(intercept * 1000000).cast("long").alias("intercept_u"),
        F.floor(r2 * 1000000).cast("long").alias("r2_u"),
    )
