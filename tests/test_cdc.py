"""snapshot_diff and align_schemas unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from delta_unity_duckdb_spark.operators.cdc import align_schemas, snapshot_diff


def _diff(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "k long, v string, amt double")
    new = spark.createDataFrame(new_rows, "k long, v string, amt double")
    got = snapshot_diff(old, new, ["k"])
    return {r.k: (r.v, r.amt, r.change_type) for r in got.collect()}


def test_insert_update_delete_detected(spark):
    out = _diff(
        spark,
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)],
    )
    assert out == {
        2: ("B", 2.0, "update"),
        3: ("c", 3.0, "delete"),  # deletes carry OLD values
        4: ("d", 4.0, "insert"),
    }
    assert 1 not in out  # unchanged rows dropped


def test_null_transitions_are_changes(spark):
    out = _diff(
        spark,
        [(1, None, 1.0), (2, "x", None)],
        [(1, "now-set", 1.0), (2, "x", None)],
    )
    # NULL→value is an update; NULL==NULL is NOT a change (null-safe eq)
    assert out == {1: ("now-set", 1.0, "update")}


def test_diff_feeds_scd2_style_counts(spark):
    old = spark.createDataFrame([(i, f"v{i}", float(i)) for i in range(100)],
                                "k long, v string, amt double")
    new = spark.createDataFrame(
        [(i, f"v{i}" if i % 10 else "CHANGED", float(i)) for i in range(5, 105)],
        "k long, v string, amt double",
    )
    got = snapshot_diff(old, new, ["k"]).groupBy("change_type").count()
    counts = {r.change_type: r["count"] for r in got.collect()}
    assert counts["insert"] == 5    # 100..104
    assert counts["delete"] == 5    # 0..4
    assert counts["update"] == 9    # multiples of 10 in 5..99 → 10,20,..,90


def test_align_schemas_adds_casts_drops(spark):
    target = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("new_col", DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, 7, "extra")], "k int, v int, legacy string"
    )  # k needs widening, v needs type change, legacy must drop
    out = align_schemas(df, target)
    assert [f.name for f in out.schema.fields] == ["k", "v", "new_col"]
    assert dict(out.dtypes) == {"k": "bigint", "v": "string", "new_col": "double"}
    row = out.collect()[0]
    assert (row.k, row.v, row.new_col) == (1, "7", None)
