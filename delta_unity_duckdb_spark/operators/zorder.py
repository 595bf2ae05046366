"""Z-order (Morton-curve) clustering for multi-column data skipping.

Sorting a table by one column makes that column's per-file min/max ranges
disjoint (perfect skipping) but leaves every other column's ranges as wide
as the table. Interleaving the bits of several columns' normalized ranks
yields a space-filling curve: files hold points that are close in EVERY
dimension, so min/max stats stay tight on all of them — the same layout
trick behind Delta OPTIMIZE ZORDER BY, here as a plain DataFrame rewrite
any engine can read.

Implementation is all built-in expressions (whole-stage codegen):
1. per column: min/max from one cheap agg (broadcast scalar row),
2. normalize to an integer grid of 2^bits cells,
3. interleave bits with shift/or arithmetic into the Morton key,
4. repartitionByRange + sortWithinPartitions on the key.

The range partitioner samples the key distribution, so output files are
balanced even when the raw columns are skewed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 12  # 4096 grid cells/dimension; 2 cols → 24-bit keys, well inside long


def _grid_cell(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Normalize a numeric column to an integer cell in [0, 2^bits)."""
    n_cells = 1 << bits
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    cell = F.floor(frac * n_cells).cast("long")
    return F.least(F.greatest(cell, F.lit(0)), F.lit(n_cells - 1))


def zorder_key(cells: list[Column], bits: int = _BITS) -> Column:
    """Morton interleave: bit i of column j lands at position i*ncols + j."""
    ncols = len(cells)
    parts = [
        F.shiftleft(
            F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * ncols + j
        )
        for j, cell in enumerate(cells)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = _BITS,
) -> None:
    """Rewrite ``df`` z-ordered on ``cols`` (numeric) into ``n_files``
    parquet files. One extra agg job for the min/max bounds; the main pass
    is a single range shuffle on the Morton key."""
    bounds = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    with_bounds = df.join(F.broadcast(bounds))
    cells = [
        _grid_cell(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits)
        for c in cols
    ]
    keyed = with_bounds.withColumn("__zkey", zorder_key(cells, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
