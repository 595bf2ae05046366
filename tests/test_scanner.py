"""Scanner + CLI parity tests (reference delta-unity-duckdb.js:56-635)."""

from __future__ import annotations

import json

from delta_unity_duckdb_spark.scanner import Scanner


def test_bare_scan_default_limit(spark, sf_dir):
    sc = Scanner(spark, sf_dir)
    assert len(sc.query("lineitem").collect()) == 10
    assert len(sc.query("region", limit=3).collect()) == 3


def test_table_substitution_global(spark, sf_dir):
    """$TABLE replaced at EVERY occurrence (js:334 /g regex) — self-join."""
    sc = Scanner(spark, sf_dir)
    df = sc.query(
        "nation",
        "SELECT a.n_name AS a_name, b.n_name AS b_name "
        "FROM $TABLE a JOIN $TABLE b ON a.n_regionkey = b.n_regionkey "
        "WHERE a.n_nationkey < b.n_nationkey",
    )
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"a_name", "b_name"}


def test_query_group_topk(spark, sf_dir):
    """The reference README.md:133 documented example shape."""
    sc = Scanner(spark, sf_dir)
    rows = sc.query(
        "lineitem",
        "SELECT l_returnflag, COUNT(*) AS count FROM $TABLE "
        "GROUP BY l_returnflag ORDER BY count DESC LIMIT 5",
    ).collect()
    assert 0 < len(rows) <= 5
    assert rows[0]["count"] >= rows[-1]["count"]


def test_count_and_schema(spark, sf_dir):
    sc = Scanner(spark, sf_dir)
    assert sc.count("region") == 5
    schema = sc.schema("lineitem")
    names = {f["column_name"] for f in schema}
    assert {"l_orderkey", "l_quantity", "l_returnflag"} <= names
    assert all("column_type" in f for f in schema)


def test_path_load(spark, sf_dir):
    sc = Scanner(spark, sf_dir)
    assert sc.count(f"{sf_dir}/region.parquet") == 5


def test_json_edge_bigint_safe(spark, sf_dir):
    sc = Scanner(spark, sf_dir)
    df = sc.query("region", "SELECT r_regionkey, 9007199254740993 AS big FROM $TABLE LIMIT 1")
    payload = json.loads(sc.to_json(df))
    assert payload[0]["big"] == "9007199254740993"  # >2^53 → string (js:528-532)
    assert isinstance(payload[0]["r_regionkey"], int)


def test_format_table(spark, sf_dir):
    sc = Scanner(spark, sf_dir)
    out = sc.format_table(
        [{"a": 1, "b": None}, {"a": 22, "b": "x"}]
    )
    lines = out.splitlines()
    assert lines[0].startswith("a")
    assert "NULL" in lines[2]
    assert sc.format_table([]) == "(no rows)"


def test_cli_json(spark, sf_dir, capsys):
    from delta_unity_duckdb_spark import cli

    rc = cli.main(
        [
            "--table", "region",
            "--query", "SELECT COUNT(*) AS n FROM $TABLE",
            "--format", "json",
            "--sf-dir", sf_dir,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert json.loads(out.strip()) == [{"n": 5}]


def test_cli_schema_and_count(spark, sf_dir, capsys):
    from delta_unity_duckdb_spark import cli

    assert cli.main(["--table", "region", "--schema", "--sf-dir", sf_dir]) == 0
    assert "r_regionkey" in capsys.readouterr().out
    assert cli.main(["--table", "region", "--count", "--sf-dir", sf_dir]) == 0
    assert capsys.readouterr().out.strip() == "5"


def test_missing_table_errors_cleanly(spark, sf_dir):
    sc = Scanner(spark, sf_dir)
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(Exception):
        sc.count("/no/such/path.parquet")
    with pytest.raises(AnalysisException):
        sc.query("region", "SELECT nope FROM $TABLE").collect()


def test_bad_sql_raises(spark, sf_dir):
    import pytest

    sc = Scanner(spark, sf_dir)
    with pytest.raises(Exception):
        sc.query("region", "SELEC broken")


def test_cli_explain_prints_plan(spark, sf_dir, capsys):
    from delta_unity_duckdb_spark import cli

    rc = cli.main(
        [
            "--table", "lineitem",
            "--query",
            "SELECT l_returnflag, COUNT(*) AS n FROM $TABLE GROUP BY 1",
            "--explain",
            "--sf-dir", sf_dir,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "HashAggregate" in out
    assert "Scan parquet" in out or "FileScan" in out
