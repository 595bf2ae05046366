"""Bucketed co-located join: same results as a plain join, with the
shuffle eliminated from the plan — the write-time join strategy for
fact⋈fact at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.sources.sinks import write_bucketed
from delta_unity_duckdb_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "orders_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "lineitem_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_no_shuffle(spark, bucketed):
    """With broadcast off (both sides 'big', the fact⋈fact scenario), the
    bucketed join must run as a zero-Exchange sort-merge join."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bkt")
        li = spark.table("lineitem_bkt")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    got = (
        spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    assert (got["n"], got["q"]) == (want["n"], want["q"])


def test_bucketed_aggregation_no_shuffle(spark, bucketed):
    """groupBy on the bucket key also reuses the bucketing — no Exchange."""
    agg = spark.table("lineitem_bkt").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
