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
