"""Null-safe change detection (maps reference delta_to_postgres_scd.py:252).

The reference guards its SCD2 close statement with
``COALESCE(t.col, '') != COALESCE(EXCLUDED.col, '')`` — a string-coerced
comparison that collapses NULL and ''. The engine uses Spark's null-safe
equality (``<=>``) instead, which treats NULL as a distinct, comparable
value (SQL ``IS DISTINCT FROM``). Documented divergence: NULL vs '' counts
as a change here, not in the reference.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullsafe_changed(left_prefix: str, right_prefix: str, cols: Iterable[str]) -> Column:
    """OR-chain of per-column null-safe inequality between two aliased sides."""
    pred: Column | None = None
    for c in cols:
        neq = ~(F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}")))
        pred = neq if pred is None else (pred | neq)
    if pred is None:
        return F.lit(False)
    return pred
