"""Multi-format source tests: CSV/JSON/parquet through read_any and the
Scanner path (reference read_csv/read_json passthrough surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.scanner import Scanner
from delta_unity_duckdb_spark.sources.tables import load_table, read_any


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_csv")
    n.write.option("header", "true").csv(p)
    back = read_any(spark, p + "/", fmt="csv")
    assert back.count() == n.count()
    assert set(back.columns) == set(n.columns)
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")  # inferSchema


def test_json_roundtrip(spark, sf_dir, tmp_path):
    r = load_table(spark, sf_dir, "region")
    p = str(tmp_path / "region_json")
    r.write.json(p)
    back = read_any(spark, p, fmt="json")
    assert back.count() == 5
    assert set(back.columns) == set(r.columns)


def test_scanner_queries_csv_path(spark, sf_dir, tmp_path):
    r = load_table(spark, sf_dir, "region")
    p = str(tmp_path / "region.csv")
    r.write.option("header", "true").csv(p)
    sc = Scanner(spark, sf_dir)
    out = sc.query(p, "SELECT COUNT(*) AS n FROM $TABLE").collect()
    assert out[0]["n"] == 5


def test_format_inference_by_extension(spark, sf_dir, tmp_path):
    r = load_table(spark, sf_dir, "region")
    jp = str(tmp_path / "r.json")
    r.write.json(jp)
    assert read_any(spark, jp).count() == 5  # inferred json
    assert read_any(spark, f"{sf_dir}/region.parquet").count() == 5  # parquet default


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is a first-class columnar source in Spark (vectorized reader,
    predicate pushdown) — same read_any surface as parquet."""
    n = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation.orc")
    n.write.orc(p)
    back = read_any(spark, p)  # inferred from the .orc extension
    assert back.count() == n.count()
    assert set(back.columns) == set(n.columns)
    explicit = read_any(spark, p, fmt="orc")
    assert explicit.count() == n.count()


def test_repl_dml_insert(spark, sf_dir, tmp_path):
    """B16: DML through the REPL with a rowcount-style report."""
    from delta_unity_duckdb_spark.repl import SQLRepl

    repl = SQLRepl(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS repl_dml_t")
    spark.sql("CREATE TABLE repl_dml_t (k INT, v STRING) USING parquet")
    try:
        res = repl.execute_query("INSERT INTO repl_dml_t VALUES (1, 'a'), (2, 'b')")
        assert res["kind"] == "dml"
        rows = repl.execute_query("SELECT COUNT(*) AS n FROM repl_dml_t")
        assert rows["rows"][0]["n"] == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS repl_dml_t")
