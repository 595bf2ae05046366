"""Exact, engine-portable numeric aggregation helpers.

Floating-point sums are order-dependent; a distributed partial aggregate
(Spark) and a sequential scan (single-node engines) can disagree in the
last ulps, which breaks value-hash comparison and, at 100 TB, makes runs
non-reproducible. The fix: aggregate in DECIMAL (exact, associative,
order-independent), then cast the final scalar to DOUBLE. The cast is
deterministic, so any engine computing the same logical sum gets the
bit-identical double.

``sql_*`` helpers emit the equivalent ANSI/DuckDB SQL so Spark queries and
their oracle twins share one definition.

ROUND-on-double hazard (learned at sf0.1): two engines computing the SAME
IEEE-754 double can still disagree after ROUND — Spark rounds the shortest
decimal rendering HALF_UP, DuckDB rounds the binary value — so a result
landing exactly on a .5 boundary flips per engine. For oracle-checked
fractional outputs derived from doubles, FLOOR-quantize instead
(``FLOOR(x * 10^k)`` as int64): floor has no tie-break, identical doubles
floor identically. ROUND stays safe only when its input is already exact
(a DECIMAL cast to double, integer ratios off boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
SQL_DEC = "DECIMAL(18,4)"
DEC38 = "decimal(38,6)"
SQL_DEC38 = "DECIMAL(38,6)"

# Narrow types for decimal *arithmetic* (products must stay within 38 digits
# in BOTH engines, whose precision-propagation rules differ — keep inputs
# narrow so neither engine hits its cap and rounds).
MONEY = "decimal(14,4)"
SQL_MONEY = "DECIMAL(14,4)"
RATE = "decimal(6,4)"
SQL_RATE = "DECIMAL(6,4)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Exact sum of a double column, returned as DECIMAL(38,6).

    Kept in decimal: engines convert high-precision decimals to double with
    different algorithms (divide vs multiply-by-inverse), which differ by
    1 ulp once the value exceeds ~15 significant digits — a real hazard at
    100 TB magnitudes. Decimal output is exact at any scale factor.
    """
    return F.sum(dec(col)).cast(DEC38).alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Reproducible mean: exact decimal sum → double → divide by count →
    round to 6 decimals (absorbs any 1-ulp conversion skew)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(dec(c)).cast("double") / F.count(c), 6).alias(alias)


def dmoney(col: str | Column) -> Column:
    """Money-typed exact decimal (for decimal arithmetic, not just summing).

    IMPORTANT: never cast a *computed double* to decimal for oracle-checked
    arithmetic — engines differ in double→decimal tie-rounding. Cast the raw
    columns (exactly representable at their data scale) and do the
    arithmetic in decimal.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def drate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS {SQL_DEC38}) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"
        f" / COUNT({expr}), 6) AS {alias}"
    )


# ---------------------------------------------------------------- fixed-point two-phase sums
def fx_sums(
    df,
    group_cols: list[str],
    specs: dict[str, tuple[Column, int]],
    extras: dict[str, Column | tuple[Column, str]] | None = None,
    bounds: dict[str, tuple[int, int]] | None = None,
    carry: list[str] | None = None,
):
    """Exact decimal-valued sums at BigDecimal-free cost: the two-phase
    scale-S fixed-point pattern proven on pricing_summary, packaged.

    ``specs`` maps ``alias -> (long_expr, scale)`` where ``long_expr`` is
    an int64 Column equal to value·10^scale EXACTLY (build from inputs
    that are exact at their data scale — e.g. ``CAST(x*10000 + 0.5d AS
    BIGINT)`` for nonnegative ≤4-decimal doubles, and int64 products
    thereof). When ``bounds`` prove every term fits one sub-10⁹ word the
    split is skipped entirely (narrow path — see the inline comment);
    otherwise each term is split at 10⁹ (hi = x div 10⁹, lo = x mod 10⁹ —
    a truncation pair, exact on both signs) and summed AS LONGS per
    (group, spark_partition_id): whole-stage-codegen primitive adds, and
    an int64 partial never spans more than one scan partition — any
    partition under ~9·10⁹ rows is overflow-safe, vs ~10⁶ rows per
    128 MB split. The tiny final merge widens to DECIMAL(19,0) (holds any
    int64 — the cast cannot overflow), sums exactly, narrows to the
    documented ≤10²² global bound, and reassembles

        value = S_hi·10^(9−s) + S_lo·10^(−s)

    with precision-tracked multiplies (every intermediate ≤ 38 digits —
    no precision-loss rescale), yielding a DECIMAL column named
    ``alias`` whose value is bit-identical to ``SUM(CAST(… AS DECIMAL))``
    at any partition count, plus ``n_<alias>`` = the COUNT of non-NULL
    terms (NULL inputs produce NULL longs, which both the sums and these
    counts skip — the same semantics as SUM/COUNT over the decimal
    column, ready for exact averages). ``extras`` adds decomposable
    partials carried through both phases — a plain Column (e.g.
    ``F.count(F.lit(1))``) merges with SUM; a ``(Column, "min"|"max"|
    "sum")`` pair picks the phase-2 merge, so one fx pass also carries
    min/max aggregates (the salted-hot-key shape: exact decimal sum +
    count/min/max in one scan). Extras may reference only ``group_cols``
    plus columns named in ``carry`` (the fixed-point projection prunes
    everything else). Beyond ~10²² in a global sum the
    narrowing cast nulls out loudly (non-ANSI) instead of wrapping.

    The caller finishes the job: cast to the oracle's output type
    (DECIMAL(38,6), DOUBLE, …) and compute any ratios — this helper only
    guarantees the exact sums. (Round-9 re-measurement: on Spark 4.1.2
    PullOutNondeterministic hoists spark_partition_id() into a Project
    below the aggregate and BOTH phases whole-stage-codegen — an
    explicit pre-projected pid column planned and timed identically, so
    there is no interpreted-agg tax left to remove; the historical sf10
    win over per-row BigDecimal stands: pricing_summary 27.6 s → 1.9 s.)

    ``bounds`` (optional) maps ``alias -> (lo, hi)``: the admissible
    per-row range of the int64 long expression. The preconditions above
    (nonnegative inputs for the ``+0.5d`` rounding recipe, per-row int64
    headroom for products like ``q4*q4*q4``) are otherwise UNENFORCED — a
    violating input silently wraps in non-ANSI long multiply and corrupts
    the sums without the loud NULL the decimal narrowing gives. The check
    rides the aggregate: MIN/MAX of the long expression are carried
    through both phases (two primitive-long aggs — measured cheaper at
    600 M rows than the per-row CASE/raise_error branch it replaced,
    which cost ~0.9 s) and the final projection raises
    (``raise_error``, fails the job loudly) if any group's extrema
    escape [lo, hi] — detection is identical because MIN/MAX see every
    row the sums see. Note a bound can't catch a wrap that lands back
    inside the range, so pick ``hi`` tight (e.g. the max data value,
    not INT64_MAX); it reliably catches the common failure — a negative
    long from an even number of wraps or a negative input hitting the
    truncate-toward-zero rounding recipe.
    """
    from pyspark.sql import functions as F

    # normalize extras to (partial_column, merge_fn) pairs
    _MERGE = {"sum": F.sum, "min": F.min, "max": F.max}
    extras = {
        a: (v if isinstance(v, tuple) else (v, "sum"))
        for a, v in (extras or {}).items()
    }
    for a, (_c, m) in extras.items():
        if m not in _MERGE:
            raise ValueError(f"extras[{a}]: unsupported merge {m!r}")

    bounds = bounds or {}
    # Narrow-word specialization: when declared bounds prove every
    # per-row value fits in one sub-10⁹ word (|v| ≤ 10⁹), the hi word is
    # identically zero — skip the div/mod split and the second sum
    # entirely and sum the long directly. Safety margin is unchanged in
    # kind: a per-(group, partition) partial overflows only past
    # 9.2·10¹⁸ / 10⁹ ≈ 9.2·10⁹ rows in ONE scan partition (a 128 MB
    # parquet split holds ~10⁶–10⁷ rows), and the MIN/MAX guard that
    # rides the aggregate still fails loudly if data escapes the
    # declared range. This is the window/TPC-H family's common case
    # (value·10⁴ ≤ 10⁸) — one primitive sum instead of div+mod+two sums
    # per row on the 100 M–600 M-row scan side.
    narrow = {
        a
        for a, (b_lo, b_hi) in bounds.items()
        if -(10**9) <= b_lo <= b_hi <= 10**9
    }
    proj = df.select(
        *group_cols,
        *(carry or []),
        *[expr.alias(f"_fx_{a}") for a, (expr, _s) in specs.items()],
    )
    partial = proj.groupBy(
        *group_cols, F.spark_partition_id().alias("_pid")
    ).agg(
        *[
            agg
            for a in specs
            for agg in (
                # Integer `div`/`%` only — a double round-trip for the hi
                # part would mis-truncate within ~2e-6 of an integer for
                # near-int64 inputs; div is exact on the full long range
                # and (div, %) is a truncation pair so hi·10⁹ + lo
                # reassembles x exactly on both signs.
                *(
                    ()
                    if a in narrow
                    else (
                        F.sum(F.expr(f"_fx_{a} div 1000000000")).alias(
                            f"_hi_{a}"
                        ),
                    )
                ),
                F.sum(
                    F.col(f"_fx_{a}")
                    if a in narrow
                    else F.expr(f"_fx_{a} % 1000000000")
                ).alias(f"_lo_{a}"),
                F.count(F.col(f"_fx_{a}")).alias(f"_n_{a}"),
            )
        ],
        *[
            agg
            for a in bounds
            for agg in (
                F.min(f"_fx_{a}").alias(f"_vmin_{a}"),
                F.max(f"_fx_{a}").alias(f"_vmax_{a}"),
            )
        ],
        *[c.alias(f"_x_{a}") for a, (c, _m) in extras.items()],
    )
    d19 = lambda c: F.sum(F.col(c).cast("decimal(19,0)"))  # noqa: E731
    merged = partial.groupBy(*group_cols).agg(
        *[
            agg
            for a in specs
            for agg in (
                *(() if a in narrow else (d19(f"_hi_{a}").alias(f"_HI_{a}"),)),
                d19(f"_lo_{a}").alias(f"_LO_{a}"),
                F.sum(f"_n_{a}").alias(f"n_{a}"),
            )
        ],
        *[
            agg
            for a in bounds
            for agg in (
                F.min(f"_vmin_{a}").alias(f"_VMIN_{a}"),
                F.max(f"_vmax_{a}").alias(f"_VMAX_{a}"),
            )
        ],
        *[_MERGE[m](f"_x_{a}").alias(a) for a, (_c, m) in extras.items()],
    )
    out = []
    for a, (_e, s) in specs.items():
        lo = f"CAST(_LO_{a} AS DECIMAL(22,0))"
        e_lo = f"CAST({10 ** -s:.{s}f} AS DECIMAL({s + 1},{s}))"
        if a in narrow:
            # single-word path: the hi word is provably zero
            val = f"{lo} * {e_lo}"
        else:
            hi = f"CAST(_HI_{a} AS DECIMAL(22,0))"
            if s <= 9:
                e_hi = f"CAST({10 ** (9 - s)} AS DECIMAL({10 - s},0))"
            else:
                e_hi = (
                    f"CAST({10 ** -(s - 9):.{s - 9}f}"
                    f" AS DECIMAL({s - 8},{s - 9}))"
                )
            val = f"{hi} * {e_hi} + {lo} * {e_lo}"
        if a in bounds:
            b_lo, b_hi = bounds[a]
            # the raise rides the output column (a detached guard column
            # would be pruned); NullType coerces into the decimal branch
            val = (
                f"IF(_VMIN_{a} < {b_lo} OR _VMAX_{a} > {b_hi}, "
                f"raise_error(concat('fx_sums[{a}]: per-row value outside "
                f"[{b_lo}, {b_hi}]: min=', CAST(_VMIN_{a} AS STRING), "
                f"' max=', CAST(_VMAX_{a} AS STRING))), {val})"
            )
        out.append(f"{val} AS {a}")
    return merged.selectExpr(
        *group_cols,
        *[a for a in extras],
        *[f"n_{a}" for a in specs],
        *out,
    )


# ------------------------------------------------------- exact percentiles
def group_percentiles_exact(
    df,
    group_cols: list[str],
    value_col: str,
    percentages: list[float],
    out_names: list[str],
):
    """Exact PERCENTILE_CONT per group, as codegen-able relational ops.

    Spark's built-in ``percentile`` is an ImperativeAggregate: every task
    accumulates an OpenHashMap of (value -> count) with interpreted
    per-row eval, maps merge on the driver-side of the exchange, and the
    final sort happens per group in one thread — measured 1.9 s of
    winsorized_stats' 2.3 s at sf0.1 (round 9). This helper computes the
    IDENTICAL doubles from a value-count histogram: one codegen'd
    groupBy(group, value) count, one in-group cumulative-sum window over
    the (far smaller) distinct-value rows, then the boundary rows picked
    by conditional aggregates. Interpolation replicates
    ``Percentile.getPercentile`` exactly — ``position = p · (n − 1)``,
    and ``(higher − position) · lowerKey + (position − lower) ·
    higherKey`` with the ``higher == lower`` short-circuit — so outputs
    are bit-identical to the built-in (and to DuckDB's quantile_cont
    wherever the built-in already matched it). NULL values are excluded
    exactly as the built-in ignores them; a group with only NULLs
    disappears (callers LEFT-join and treat missing as NULL bounds,
    matching the built-in's NULL output).

    Scale: the heavy input collapses at the first map-side-combined
    count; the window runs over distinct values per group — the same
    state the built-in buffers per task, but spilled/sorted by the
    engine instead of held in one hash map.

    Returns one row per group: ``group_cols + out_names``.
    """
    from pyspark.sql import Window

    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wt = Window.partitionBy(*group_cols)
    h = vc.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        (F.sum("_c").over(w) - F.col("_c")).alias("_lo"),
        F.sum("_c").over(w).alias("_hi"),
        F.sum("_c").over(wt).alias("_n"),
    )
    aggs = []
    for p, name in zip(percentages, out_names):
        pos = F.lit(float(p)) * (F.col("_n") - 1).cast("double")
        lower, higher = F.floor(pos), F.ceil(pos)
        aggs += [
            F.max(
                F.when((F.col("_lo") <= lower) & (lower < F.col("_hi")), F.col("_v"))
            ).alias(f"_lk_{name}"),
            F.max(
                F.when(
                    (F.col("_lo") <= higher) & (higher < F.col("_hi")), F.col("_v")
                )
            ).alias(f"_hk_{name}"),
            F.max(pos).alias(f"_pos_{name}"),
        ]
    g = h.groupBy(*group_cols).agg(*aggs)
    outs = []
    for name in out_names:
        pos = F.col(f"_pos_{name}")
        lower, higher = F.floor(pos), F.ceil(pos)
        lk, hk = F.col(f"_lk_{name}"), F.col(f"_hk_{name}")
        outs.append(
            F.when(lower == higher, lk)
            .otherwise(
                (higher.cast("double") - pos) * lk
                + (pos - lower.cast("double")) * hk
            )
            .alias(name)
        )
    return g.select(*group_cols, *outs)
