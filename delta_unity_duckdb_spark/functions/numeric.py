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
