"""Salted aggregation / join equivalence tests: salting must never change
results, only physical distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators.skew import (
    key_skew_profile,
    salted_agg,
    salted_join,
)
from delta_unity_duckdb_spark.sources.tables import load_table


def _sorted(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = salted_agg(
        li,
        ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count", "l_extendedprice": "max"},
        n_salts=8,
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_orderkey").alias("count_l_orderkey"),
        F.max("l_extendedprice").alias("max_l_extendedprice"),
    )
    assert _sorted(got, "l_returnflag") == _sorted(want, "l_returnflag")


def test_salted_join_equals_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    got = salted_join(o, c, ["o_custkey"], n_salts=4)
    want = o.join(c, ["o_custkey"])
    assert sorted(got.columns) == sorted(want.columns)
    assert _sorted(got.select("o_orderkey", "c_mktsegment"), "o_orderkey") == _sorted(
        want.select("o_orderkey", "c_mktsegment"), "o_orderkey"
    )


def test_salted_join_outer_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    got = salted_join(left, right, ["k"], n_salts=4, how="left")
    rows = {r["k"]: r["w"] for r in got.collect()}
    assert rows == {1: "x", 2: "y", 99: None}


def test_key_skew_profile(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    prof = key_skew_profile(li, ["l_returnflag"], top=3).collect()
    assert len(prof) == 3
    assert prof[0]["n_rows"] >= prof[-1]["n_rows"]
    assert abs(sum(r["share"] for r in prof) - 1.0) < 0.01  # 3 flags cover all
