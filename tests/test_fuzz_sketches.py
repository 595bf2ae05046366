"""Randomized cross-engine fuzz of the portable-hash sketch path: the
entire sketch architecture rests on ``md5``-derived hashes being
bit-identical between Spark and DuckDB for ARBITRARY strings (unicode,
quotes, whitespace, empty). The fixed oracle suite only exercises fixture
values; here hypothesis generates adversarial inputs and the HLL register
table and KMV minima must match DuckDB exactly, row for row.

Data is handed to DuckDB via a registered pandas frame — no SQL literal
escaping in the loop, so weird characters hit the hash functions, not the
test encoding."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_unity_duckdb_spark.operators import sketches as SK

# printable-ish unicode incl. quotes/backslashes/newlines; also empty
_VALUES = st.text(min_size=0, max_size=24)
_GROUPS = st.sampled_from(["g1", "g2", "g3"])
_ROWS = st.lists(st.tuples(_GROUPS, _VALUES), min_size=1, max_size=60)


def _duck_con(rows):
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    con.register("fuzz", pdf)
    return con


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS)
def test_hll_registers_bit_identical_cross_engine(spark, rows):
    sdf = spark.createDataFrame(rows, "g string, v string")
    got = sorted(
        (r["g"], r["reg"], r["max_rho"])
        for r in SK.hll_sketch(sdf, ["g"], "v", p=6).collect()
    )
    con = _duck_con(rows)
    m, w = 64, 54
    want = sorted(
        con.execute(
            f"""
            WITH h AS (SELECT g,
                CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS _h
                FROM fuzz)
            SELECT g, _h % {m} AS reg,
                   MAX(CASE WHEN _h // {m} = 0 THEN {w + 1}
                            ELSE {w + 1} - length(bin(_h // {m})) END) AS max_rho
            FROM h GROUP BY g, _h % {m}
            """
        ).fetchall()
    )
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS)
def test_kmv_minima_bit_identical_cross_engine(spark, rows):
    sdf = spark.createDataFrame(rows, "g string, v string")
    got = sorted(
        (r["g"], r["h"], r["rn"])
        for r in SK.kmv_sketch(sdf, ["g"], "v", k=8).collect()
    )
    con = _duck_con(rows)
    want = sorted(
        con.execute(
            """
            WITH dh AS (SELECT DISTINCT g,
                CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM fuzz),
            rk AS (SELECT g, h,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn FROM dh)
            SELECT g, h, rn FROM rk WHERE rn <= 8
            """
        ).fetchall()
    )
    assert got == want
