"""fx_sums (functions/numeric.py) — exactness and the strict bounds path.

The two-phase scale-S fixed-point sum must be bit-identical to
SUM(CAST(... AS DECIMAL)) at any partition count, and the optional
per-row ``bounds`` must turn a precondition violation (negative input
into the +0.5d recipe, int64 overflow headroom breach) into a loud
runtime error instead of a silently-wrapped sum.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F


def _fixture(spark, vals, parts):
    return spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, x double"
    ).repartition(parts)


def test_fx_sums_matches_decimal_sum(spark):
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    vals = [1.23, 4.56, 0.01, 999999.99, 12.34, 0.0]
    for parts in (1, 3, 8):
        df = _fixture(spark, vals, parts)
        ex = F.expr("CAST(x * 10000 + 0.5d AS BIGINT)")
        out = fx_sums(df, ["k"], {"fx": (ex, 4)}).collect()[0]
        want = sum(Decimal(str(v)) for v in vals)
        assert Decimal(out["fx"]) == want
        assert out["n_fx"] == len(vals)


def test_fx_sums_bounds_raise_on_violation(spark):
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    df = _fixture(spark, [1.0, -5.0, 2.0], 2)
    ex = F.expr("CAST(x * 10000 + 0.5d AS BIGINT)")
    # Unbounded: the negative slips through (documented hazard).
    fx_sums(df, ["k"], {"fx": (ex, 4)}).collect()
    # Bounded: the violating row fails the job loudly.
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        fx_sums(
            df, ["k"], {"fx": (ex, 4)}, bounds={"fx": (0, 10**7)}
        ).collect()
    assert "fx_sums[fx]" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )


def test_fx_sums_bounds_pass_through_on_valid_input(spark):
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    vals = [1.5, 2.25, 3.75]
    df = _fixture(spark, vals, 3)
    ex = F.expr("CAST(x * 10000 + 0.5d AS BIGINT)")
    out = fx_sums(
        df, ["k"], {"fx": (ex, 4)}, bounds={"fx": (0, 10**7)}
    ).collect()[0]
    assert Decimal(out["fx"]) == Decimal("7.5")


def test_fx_sums_null_semantics(spark):
    """NULL inputs skip both the sum and n_<alias> — and must not trip
    the bounds check."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 2.0)], "k string, x double"
    ).repartition(2)
    ex = F.expr("CAST(x * 10000 + 0.5d AS BIGINT)")
    out = fx_sums(
        df, ["k"], {"fx": (ex, 4)}, bounds={"fx": (0, 10**7)}
    ).collect()[0]
    assert Decimal(out["fx"]) == Decimal("3.0")
    assert out["n_fx"] == 2


def test_fx_sums_carried_minmax_extras(spark):
    """(Column, "min"|"max"|"sum") extras ride the fx pass over `carry`
    columns and merge with the declared function in phase 2 — the
    salted_hot_key_agg shape (exact decimal sum + count/min/max, one
    scan)."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    rows = [("a", 1.0, 10.0), ("a", 2.0, -3.5), ("b", 5.0, 7.25)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    for parts in (1, 4):
        out = {
            r["k"]: r
            for r in fx_sums(
                df.repartition(parts),
                ["k"],
                {"sx": (F.expr("CAST(x * 10000 + 0.5d AS BIGINT)"), 4)},
                extras={
                    "n": F.count(F.lit(1)),  # bare Column -> SUM merge
                    "mn_y": (F.min("y"), "min"),
                    "mx_y": (F.max("y"), "max"),
                },
                carry=["y"],
            ).collect()
        }
        assert Decimal(out["a"]["sx"]) == Decimal("3.0")
        assert (out["a"]["n"], out["a"]["mn_y"], out["a"]["mx_y"]) == (2, -3.5, 10.0)
        assert (out["b"]["n"], out["b"]["mn_y"], out["b"]["mx_y"]) == (1, 7.25, 7.25)


def test_fx_sums_rejects_unknown_extra_merge(spark):
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    df = spark.createDataFrame([("a", 1.0)], "k string, x double")
    with pytest.raises(ValueError, match="unsupported merge"):
        fx_sums(
            df,
            ["k"],
            {"sx": (F.expr("CAST(x * 10000 + 0.5d AS BIGINT)"), 4)},
            extras={"bad": (F.avg("x"), "avg")},
        )


def test_fx_sums_narrow_word_path_matches_wide(spark):
    """Bounds inside [-1e9, 1e9] switch fx_sums to the single-word sum
    (no hi/lo split — round-8 specialization); the values must be
    bit-identical to the split path at any partition count, including
    the all-NULL and empty-group edges."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    vals = [1.23, 4.56, 0.01, 99999.99, 12.34, 0.0]
    ex = F.expr("CAST(x * 10000 + 0.5d AS BIGINT)")
    for parts in (1, 3, 8):
        df = _fixture(spark, vals, parts)
        narrow = fx_sums(
            df, ["k"], {"fx": (ex, 4)}, bounds={"fx": (0, 10**9)}
        ).collect()[0]
        wide = fx_sums(
            df, ["k"], {"fx": (ex, 4)}, bounds={"fx": (0, 10**9 + 1)}
        ).collect()[0]
        assert Decimal(narrow["fx"]) == Decimal(wide["fx"])
        assert narrow["n_fx"] == wide["n_fx"] == len(vals)


def test_fx_sums_narrow_word_bounds_still_raise(spark):
    """The MIN/MAX guard must survive the narrow-word specialization —
    an out-of-range row fails loudly, not silently."""
    from delta_unity_duckdb_spark.functions.numeric import fx_sums

    df = _fixture(spark, [1.0, -5.0, 2.0], 2)
    out = fx_sums(
        df,
        ["k"],
        {"fx": (F.expr("CAST(x * 10000 + 0.5d AS BIGINT)"), 4)},
        bounds={"fx": (0, 10**9)},
    )
    with pytest.raises(Exception, match="fx_sums\\[fx\\]"):
        out.collect()
