"""Randomized differential testing: hypothesis generates query SHAPES
(filter conjunctions x aggregate sets x group keys over orders/lineitem),
each rendered twice — once as DataFrame ops, once as SQL for DuckDB — and
the results must hash-match exactly.

The fixed oracle suite (test_oracle.py) checks the queries we THOUGHT to
write; this checks the ones we didn't. Every predicate/aggregate pair is
built from one spec, so a mismatch means an engine-semantics divergence
(null handling, type coercion, overflow), not a test-encoding bug.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.numeric import dec
from delta_unity_duckdb_spark.sources.tables import load_table
from tests.oracle_harness import df_multiset

SF_DIR = "/root/testdata/sf0.001"  # smoke scale: ~6k lineitem, 100 runs stay fast

# ---- predicate specs: (name, spark_column_fn, sql_text) ------------------
PREDICATES = [
    ("prio_urgent", lambda: F.col("o_orderpriority") == "1-URGENT",
     "o_orderpriority = '1-URGENT'"),
    ("prio_not_low", lambda: F.col("o_orderpriority") != "5-LOW",
     "o_orderpriority <> '5-LOW'"),
    ("price_low", lambda: F.col("o_totalprice") < 50000.0,
     "o_totalprice < 50000.0"),
    ("price_band", lambda: F.col("o_totalprice").between(20000.0, 120000.0),
     "o_totalprice BETWEEN 20000.0 AND 120000.0"),
    ("key_mod", lambda: F.col("o_orderkey") % 7 == 3,
     "o_orderkey % 7 = 3"),
    ("status_in", lambda: F.col("o_orderstatus").isin("O", "F"),
     "o_orderstatus IN ('O', 'F')"),
    ("date_late", lambda: F.col("o_orderdate") >= "1997-01-01",
     "o_orderdate >= TIMESTAMP '1997-01-01'"),
    ("cust_even", lambda: F.col("o_custkey") % 2 == 0,
     "o_custkey % 2 = 0"),
]

# ---- aggregate specs: (alias, spark_agg_fn, sql_text) --------------------
AGGREGATES = [
    ("n", lambda: F.count(F.lit(1)).alias("n"), "COUNT(*) AS n"),
    ("n_cust", lambda: F.countDistinct("o_custkey").alias("n_cust"),
     "COUNT(DISTINCT o_custkey) AS n_cust"),
    ("sum_price", lambda: F.sum(dec("o_totalprice")).cast("decimal(38,6)").alias("sum_price"),
     "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_price"),
    ("min_key", lambda: F.min("o_orderkey").alias("min_key"),
     "MIN(o_orderkey) AS min_key"),
    ("max_key", lambda: F.max("o_orderkey").alias("max_key"),
     "MAX(o_orderkey) AS max_key"),
    ("min_date", lambda: F.min("o_orderdate").alias("min_date"),
     "MIN(o_orderdate) AS min_date"),
]

GROUP_KEYS = [
    [],
    ["o_orderstatus"],
    ["o_orderpriority"],
    ["o_orderstatus", "o_orderpriority"],
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    yield con
    con.close()


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred_idx=st.lists(
        st.integers(0, len(PREDICATES) - 1), min_size=0, max_size=3, unique=True
    ),
    agg_idx=st.lists(
        st.integers(0, len(AGGREGATES) - 1), min_size=1, max_size=4, unique=True
    ),
    group_idx=st.integers(0, len(GROUP_KEYS) - 1),
)
def test_generated_agg_query_matches_duckdb(spark, duck, pred_idx, agg_idx, group_idx):
    preds = [PREDICATES[i] for i in sorted(pred_idx)]
    aggs = [AGGREGATES[i] for i in sorted(agg_idx)]
    keys = GROUP_KEYS[group_idx]

    # Spark side
    df = load_table(spark, SF_DIR, "orders")
    for _, col_fn, _sql in preds:
        df = df.filter(col_fn())
    agg_cols = [a[1]() for a in aggs]
    sdf = df.groupBy(*keys).agg(*agg_cols) if keys else df.agg(*agg_cols)

    # DuckDB side, rendered from the same specs
    where = " AND ".join(p[2] for p in preds) or "TRUE"
    select = ", ".join(
        ([*keys] if keys else []) + [a[2] for a in aggs]
    )
    sql = f"SELECT {select} FROM orders WHERE {where}"
    if keys:
        sql += " GROUP BY " + ", ".join(keys)

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    spark_rows = [tuple(r) for r in sdf.collect()]

    assert sorted(sdf.columns) == sorted(duck_cols)
    assert df_multiset(spark_rows, sdf.columns) == df_multiset(duck_rows, duck_cols), (
        f"divergence for: {sql}"
    )


LI_PREDICATES = [
    ("qty_low", lambda: F.col("l_quantity") <= 25, "l_quantity <= 25"),
    ("flag_r", lambda: F.col("l_returnflag") == "R", "l_returnflag = 'R'"),
    ("disc_band", lambda: F.col("l_discount").between(0.02, 0.08),
     "l_discount BETWEEN 0.02 AND 0.08"),
    ("ship_97", lambda: F.col("l_shipdate") < "1998-01-01",
     "l_shipdate < TIMESTAMP '1998-01-01'"),
]

JOIN_AGGREGATES = [
    ("n", lambda: F.count(F.lit(1)).alias("n"), "COUNT(*) AS n"),
    ("n_orders", lambda: F.countDistinct("o_orderkey").alias("n_orders"),
     "COUNT(DISTINCT o_orderkey) AS n_orders"),
    ("sum_ext", lambda: F.sum(dec("l_extendedprice")).cast("decimal(38,6)").alias("sum_ext"),
     "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_ext"),
    ("max_qty", lambda: F.max("l_quantity").alias("max_qty"),
     "MAX(l_quantity) AS max_qty"),
]

JOIN_GROUP_KEYS = [[], ["o_orderpriority"], ["l_returnflag"],
                   ["o_orderstatus", "l_linestatus"]]


@pytest.fixture(scope="module")
def duck_join():
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    o_pred=st.lists(st.integers(0, len(PREDICATES) - 1), max_size=2, unique=True),
    l_pred=st.lists(st.integers(0, len(LI_PREDICATES) - 1), max_size=2, unique=True),
    agg_idx=st.lists(
        st.integers(0, len(JOIN_AGGREGATES) - 1), min_size=1, max_size=3, unique=True
    ),
    group_idx=st.integers(0, len(JOIN_GROUP_KEYS) - 1),
)
def test_generated_join_query_matches_duckdb(
    spark, duck_join, o_pred, l_pred, agg_idx, group_idx
):
    """Same spec-driven rendering, now across the orders⋈lineitem join —
    exercises join + filter placement + multi-table aggregation."""
    opreds = [PREDICATES[i] for i in sorted(o_pred)]
    lpreds = [LI_PREDICATES[i] for i in sorted(l_pred)]
    aggs = [JOIN_AGGREGATES[i] for i in sorted(agg_idx)]
    keys = JOIN_GROUP_KEYS[group_idx]

    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    for _, col_fn, _s in opreds:
        o = o.filter(col_fn())
    for _, col_fn, _s in lpreds:
        li = li.filter(col_fn())
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    agg_cols = [a[1]() for a in aggs]
    sdf = j.groupBy(*keys).agg(*agg_cols) if keys else j.agg(*agg_cols)

    where = " AND ".join([p[2] for p in opreds] + [p[2] for p in lpreds]) or "TRUE"
    select = ", ".join(([*keys] if keys else []) + [a[2] for a in aggs])
    sql = (
        f"SELECT {select} FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        f"WHERE {where}"
    )
    if keys:
        sql += " GROUP BY " + ", ".join(keys)

    res = duck_join.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    spark_rows = [tuple(r) for r in sdf.collect()]

    assert sorted(sdf.columns) == sorted(duck_cols)
    assert df_multiset(spark_rows, sdf.columns) == df_multiset(duck_rows, duck_cols), (
        f"divergence for: {sql}"
    )


# ---- window-function shapes ----------------------------------------------
# Each spec: (alias, spark_window_col_fn(Window), sql_over_text_fn(pk_sql)).
# Ordering inside every frame is by the UNIQUE o_orderkey (nondeterministic
# row_number/lag over tied orders would be a test bug, not an engine bug);
# rank exercises ties deliberately — its VALUES are deterministic under ties.

PARTITION_KEYS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_custkey % 5", "o_custkey % 5"),
]


def _win_specs():
    from pyspark.sql import Window

    def w(pk_col):
        return Window.partitionBy(F.expr(pk_col)).orderBy("o_orderkey")

    return [
        ("rn", lambda pk: F.row_number().over(w(pk)),
         lambda pk: f"ROW_NUMBER() OVER (PARTITION BY {pk} ORDER BY o_orderkey) AS rn"),
        ("lag_key", lambda pk: F.lag("o_orderkey", 1).over(w(pk)),
         lambda pk: f"LAG(o_orderkey, 1) OVER (PARTITION BY {pk} ORDER BY o_orderkey) AS lag_key"),
        ("lead_key", lambda pk: F.lead("o_orderkey", 1).over(w(pk)),
         lambda pk: f"LEAD(o_orderkey, 1) OVER (PARTITION BY {pk} ORDER BY o_orderkey) AS lead_key"),
        ("cum_n", lambda pk: F.count(F.lit(1)).over(
            w(pk).rowsBetween(Window.unboundedPreceding, Window.currentRow)),
         lambda pk: f"COUNT(*) OVER (PARTITION BY {pk} ORDER BY o_orderkey "
                    f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n"),
        ("csum_price", lambda pk: F.sum(dec("o_totalprice")).over(
            w(pk).rowsBetween(-2, Window.currentRow)).cast("decimal(38,6)"),
         lambda pk: f"CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER "
                    f"(PARTITION BY {pk} ORDER BY o_orderkey "
                    f"ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS csum_price"),
        ("price_rank", lambda pk: F.rank().over(
            Window.partitionBy(F.expr(pk)).orderBy("o_totalprice")),
         lambda pk: f"RANK() OVER (PARTITION BY {pk} ORDER BY o_totalprice) AS price_rank"),
    ]


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pk_idx=st.integers(0, len(PARTITION_KEYS) - 1),
    fn_idx=st.lists(st.integers(0, 5), min_size=1, max_size=3, unique=True),
    pred_idx=st.lists(
        st.integers(0, len(PREDICATES) - 1), min_size=0, max_size=2, unique=True
    ),
)
def test_generated_window_query_matches_duckdb(spark, duck, pk_idx, fn_idx, pred_idx):
    pk_spark, pk_sql = PARTITION_KEYS[pk_idx]
    specs = _win_specs()
    fns = [specs[i] for i in sorted(fn_idx)]
    preds = [PREDICATES[i] for i in sorted(pred_idx)]

    df = load_table(spark, SF_DIR, "orders")
    for _, col_fn, _s in preds:
        df = df.filter(col_fn())
    sdf = df.select(
        "o_orderkey", *[f[1](pk_spark).alias(f[0]) for f in fns]
    )

    where = " AND ".join(p[2] for p in preds) or "TRUE"
    select = ", ".join(["o_orderkey"] + [f[2](pk_sql) for f in fns])
    sql = f"SELECT {select} FROM orders WHERE {where}"

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    spark_rows = [tuple(r) for r in sdf.collect()]

    assert sorted(sdf.columns) == sorted(duck_cols)
    assert df_multiset(spark_rows, sdf.columns) == df_multiset(duck_rows, duck_cols), (
        f"divergence for: {sql}"
    )
