"""Oracle-differential test for every hash-checkable workload query
(the local mirror of the driver's t2 gate)."""

from __future__ import annotations

import pytest

from delta_unity_duckdb_spark.workload import ORACLE, QUERIES
from tests.oracle_harness import duck_connection, strict_compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_oracle_match(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    res = strict_compare(df, duck, ORACLE[name])
    assert res["rows_match"], f"{name}: row count {res['spark_rows']} vs {res['duck_rows']}"
    assert res["cols_match"], f"{name}: cols {res['spark_cols']} vs {res['duck_cols']}"
    assert not res["violations"], f"{name}: output-convention violations {res['violations']}"
    assert res["hash_match"], f"{name}: value mismatch {res.get('diff_sample')}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    """Rows-only queries must still execute AND honor the output-type
    convention — the driver canonicalizes their result too (round-1
    lesson: a raw array column crashes the harness even without an
    oracle)."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    pdf = df.toPandas()
    from tests.oracle_harness import _canon_sigs

    _, violations = _canon_sigs(pdf)
    assert not violations, f"{name}: output-convention violations {violations}"


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert len(df.collect()) > 0
