"""Skew-mitigation utilities (100 TB posture; SURVEY.md §7.6 design notes).

AQE's skew-join splitting (on by default in the engine session) handles
most runtime skew; these operators are the explicit, deterministic tools
for the pathological cases AQE can't fix — a single hot grouping key whose
partial aggregate still overwhelms one task, or a shuffle join against a
key distribution known to be Zipfian at plan time.

Everything salts with ``pmod(hash(salt_source), n)`` — deterministic, no
``rand()``, so retried tasks and re-runs produce identical partitioning
(nondeterministic salting breaks speculative execution and replay).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys.

    Phase 1 groups on (keys, salt) — the hot key's rows spread over
    ``n_salts`` tasks; phase 2 re-aggregates the ≤ n_salts partials per
    key. Supported aggs (decomposable): sum, count, min, max.

    ``aggs`` maps column → fn name or sequence of fn names (so one pass
    computes several aggregates of the same column — never scan twice);
    output column is ``{fn}_{col}``.

    Cost note (measured, sf100-skew, 600 M rows): for decomposable
    aggregates the salting premium is ~ZERO — Spark's map-side partial
    aggregation already shrinks both exchanges to ≤ keys·n_salts rows
    per map task, so the "double exchange" carries a few dozen partial
    rows (salted 13.1 s vs unsalted 14.2 s, same window). Don't pay a
    census pass to salt selectively; the blanket salt is already free.
    If the summed column is a DECIMAL cast from doubles, the per-row
    BigDecimal work dominates everything (+10 s at 600 M rows) — use
    the fixed-point path (functions/numeric.py fx_sums, itself a salted
    two-phase aggregate keyed on spark_partition_id) instead.
    """
    keys = list(keys)
    salt_source = (
        salt_source if salt_source is not None else F.spark_partition_id()
    )
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_source), F.lit(n_salts)))

    partial_exprs, final_exprs = [], []
    for col, fns in aggs.items():
        for fn in [fns] if isinstance(fns, str) else fns:
            out = f"{fn}_{col}"
            if fn == "count":
                partial_exprs.append(F.count(col).alias(out))
                final_exprs.append(F.sum(out).alias(out))
            elif fn == "sum":
                partial_exprs.append(F.sum(col).alias(out))
                final_exprs.append(F.sum(out).alias(out))
            elif fn in ("min", "max"):
                agg_f = F.min if fn == "min" else F.max
                partial_exprs.append(agg_f(col).alias(out))
                final_exprs.append(agg_f(out).alias(out))
            else:
                raise ValueError(f"non-decomposable agg: {fn}")

    return (
        salted.groupBy(*keys, "__salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join resilient to hot keys on the LARGE (``skewed``) side.

    The skewed side gets a deterministic salt in [0, n_salts); the other
    side is replicated once per salt value (``explode``), so matching rows
    co-locate per (key, salt) and a hot key's work spreads over n_salts
    tasks. Replication multiplies the small side by n_salts — use when
    ``other`` is modest but too big (or too skew-prone) to broadcast.
    """
    on = list(on)
    salt_col = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt_col)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = left.join(right, on + ["__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total, descending — the
    number you look at before choosing broadcast / salting / AQE."""
    keys = list(keys)
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top)
    )
