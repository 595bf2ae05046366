"""Change-data capture utilities: snapshot diff and schema alignment.

The reference's SCD2 sync is driven by whole-snapshot reads
(delta_to_postgres_scd.py:51-105) — every run re-ships the full table.
``snapshot_diff`` computes the minimal change set between two snapshots so
downstream merges (scd2_apply, JDBC upserts) touch only changed keys; at
100 TB the diff is the difference between re-writing everything and
re-writing 0.1%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Diff two snapshots by key. Returns every changed row tagged with
    ``change_type`` ∈ insert | update | delete (update rows carry the NEW
    values; deletes carry the old ones).

    One full-outer join on the key — a single co-partitioned shuffle; the
    change predicate is a null-safe comparison over the non-key columns
    (NULL-correct, unlike the reference's COALESCE-to-'' guard,
    delta_to_postgres_scd.py:252). Unchanged rows are dropped before
    anything downstream materializes.
    """
    val_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"__old_{c}") for c in val_cols])
    n = new.select(*keys, *val_cols)

    # presence flags are never-null markers — value columns can be
    # legitimately NULL, so they can't signal which side a row came from
    n_marked = n.withColumn("__in_new", F.lit(True))
    o_marked = o.withColumn("__in_old", F.lit(True))
    j = n_marked.join(o_marked, on=keys, how="full_outer")

    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))

    tagged = j.withColumn(
        "change_type",
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit(None)),
    ).filter(F.col("change_type").isNotNull())

    # deletes carry old values (new side is all-null there)
    out_vals = [
        F.when(F.col("change_type") == "delete", F.col(f"__old_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in val_cols
    ]
    return tagged.select(*keys, *out_vals, "change_type")


def align_schemas(df: DataFrame, target: StructType) -> DataFrame:
    """Coerce ``df`` to ``target``: missing columns become typed NULLs,
    extra columns drop, matching columns cast. The ingestion-side answer
    to schema drift (the reference only ever creates-if-not-exists,
    delta_to_postgres_scd.py:162 — drifted sources crash it)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
