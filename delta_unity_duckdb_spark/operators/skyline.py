"""2-D Pareto skyline (dominance) operator.

Pattern from the published skyline-on-Spark-SQL line of work (e.g.
"Integration of Skyline Queries into Spark SQL", EDBT 2023 — see
PAPERS.md): a skyline point is one no other point dominates, where q
dominates p iff q is <= p in every dimension and < in at least one
(both dimensions minimized here).

The naive formulation is a quadratic NOT EXISTS self-join. This
implementation is the scalable two-phase shape:

1. **Bucket** points into fixed-width ranges of x (bounds from a 1-row
   broadcast aggregate, like the gap-fill spine).
2. **Local pass**: within each bucket — a PARTITIONED window ordered by
   (x, y) — a point survives iff its y is strictly below the running min
   of all earlier points' y. Per-bucket state is one number.
3. **Global refinement**: per-bucket y-minima (#buckets rows) get a
   prefix-min over preceding buckets and broadcast back; a point also
   survives only if y < that cross-bucket floor (any earlier-bucket
   point has strictly smaller x, so ties on y already dominate).

Cost: one range-bucketed shuffle + one tiny broadcast — linear, no
self-join, no single-partition global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 32


def skyline2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Distinct (x, y) Pareto-skyline points, both dimensions minimized."""
    pts = df.select(F.col(x).alias("x"), F.col(y).alias("y")).distinct()

    bounds = pts.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
    )
    b = pts.crossJoin(F.broadcast(bounds)).withColumn(
        "b",
        F.when(
            F.col("xmax") > F.col("xmin"),
            F.least(
                F.floor(
                    (F.col("x") - F.col("xmin"))
                    / ((F.col("xmax") - F.col("xmin")) / N_BUCKETS)
                ),
                F.lit(N_BUCKETS - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    ).select("x", "y", "b")

    w_local = (
        Window.partitionBy("b")
        .orderBy("x", "y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("prev_min", F.min("y").over(w_local))

    bucket_mins = b.groupBy("b").agg(F.min("y").alias("bmin"))
    w_buckets = (
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bucket_mins.select(
        "b", F.min("bmin").over(w_buckets).alias("floor_min")
    )

    return (
        local.join(F.broadcast(prefix), "b")
        .filter(
            (F.col("prev_min").isNull() | (F.col("y") < F.col("prev_min")))
            & (F.col("floor_min").isNull() | (F.col("y") < F.col("floor_min")))
        )
        .select("x", "y")
    )
