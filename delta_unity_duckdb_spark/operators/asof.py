"""As-of (point-in-time) join — match each left row to the most recent
right row at or before its timestamp, per key.

The reference exposes arbitrary DuckDB SQL (delta-unity-duckdb.js:331-339),
whose dialect includes ``ASOF JOIN``; this module re-expresses it
Spark-first. Instead of a range join (which Catalyst would plan as a
broadcast-nested-loop or an exploding theta join), we use the union +
last-observation-carried-forward formulation:

1. tag right rows 0 and left rows 1, union them on (key, ts, payload);
2. one window per key ordered by (ts, tag, right id):
   ``F.last(right_payload, ignorenulls=True)`` carries the latest right
   row forward onto every subsequent row;
3. keep only left rows.

Cost model: a single hash shuffle on the key column plus a per-key sort —
linear in rows, no pair explosion, skew handled by AQE. At 100 TB this is
the canonical formulation (it is how Flink/KDB-style as-of joins are done
on shuffle engines); a range join would be quadratic per key.

Tie semantics: at equal timestamps the right row sorts before the left row
(tag 0 < 1), so matching is INCLUSIVE (``left.ts >= right.ts``) — the same
semantics as DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``. Among
right rows sharing (key, ts) the one with the largest id wins,
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: dict[str, str],
    right_id_col: str | None = None,
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join.

    Parameters
    ----------
    on : equality key columns present on both sides.
    ts_col : event-time column name, present on both sides.
    right_cols : {right_col: output_alias} payload carried from the
        matched right row; aliases must not collide with left columns.
    right_id_col : optional right column used as the deterministic
        tie-breaker among right rows with identical (key, ts); defaults
        to the first key of ``right_cols``.

    Returns the left DataFrame (all original columns) plus one nullable
    column per ``right_cols`` alias; unmatched left rows keep NULLs —
    i.e. an as-of LEFT join.
    """
    tie = right_id_col or next(iter(right_cols))
    payload = [c for c in left.columns if c not in on and c != ts_col]

    r = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(tie).cast("long").alias("__tie"),
        *[F.col(src).alias(alias) for src, alias in right_cols.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
    )
    l = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(alias)
          for src, alias in right_cols.items()],
        *[F.col(c) for c in payload],
    )
    unioned = r.unionByName(l)

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(alias, ignorenulls=True).over(w).alias(f"__m_{alias}")
            for alias in right_cols.values()
        ],
    )
    return carried.filter(F.col("__tag") == 1).select(
        *on,
        F.col("__ts").alias(ts_col),
        *[F.col(c) for c in payload],
        *[F.col(f"__m_{alias}").alias(alias) for alias in right_cols.values()],
    )
