"""Vector similarity search over embedding columns (SURVEY.md §2-E3/E4).

- ``cosine_topk``: brute-force cosine top-k against one query vector.
  The dot product is a sequential JVM-side fold (``F.aggregate`` over
  ``F.zip_with``) — no explode, no shuffle of element rows; the global
  top-k is a TakeOrderedAndProject. This is the exact baseline.
- ``ivf_topk``: IVF-style approximate search — k-means-lite centroid
  assignment (centroids = hash-sampled vectors), probe the closest
  ``nprobe`` partitions only. At 100 TB the partition pruning cuts the
  scanned fraction to nprobe/nlist while the plan stays two broadcast
  joins + one top-k.
- ``cosine_pairs_lsh``: random-hyperplane LSH blocking for pairwise
  similarity joins without a cross join.

All arithmetic is double-precision and element-order-sequential, making
results reproducible across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k by cosine similarity to a 1-row query DataFrame
    (column ``qvec``). The query side is broadcast; result columns:
    (id, cosine_sim)."""
    sim = cosine_sim(F.col(vec_col), F.col("qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        embeddings.crossJoin(F.broadcast(query))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: assign vectors to the nearest of ``nlist``
    deterministic sample centroids, search only the ``nprobe`` centroids
    closest to the query. Build once / probe many in a real deployment —
    here centroid assignment is inlined for a self-contained operator."""
    cents = (
        embeddings.filter(F.col(id_col) % F.lit(max(1, 97)) < nlist)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .alias("cid"),
            F.col(vec_col).alias("cvec"),
        )
        .filter(F.col("cid") <= nlist)
    )
    assigned = (
        embeddings.crossJoin(F.broadcast(cents))
        .withColumn("cdist", -_dot(F.col(vec_col), F.col("cvec")) / (_norm(F.col(vec_col)) * _norm(F.col("cvec"))))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("cdist", "cid")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cid")
    )
    probe = (
        cents.crossJoin(F.broadcast(query))
        .withColumn("cdist", -cosine_sim(F.col("cvec"), F.col("qvec")))
        .orderBy("cdist", "cid")
        .limit(nprobe)
        .select("cid")
    )
    return (
        assigned.join(F.broadcast(probe), "cid")
        .crossJoin(F.broadcast(query))
        .select(
            F.col(id_col),
            F.round(cosine_sim(F.col(vec_col), F.col("qvec")), 4).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def cosine_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise similarity join above ``threshold`` via random-hyperplane
    LSH: sign-bit sketch → banded equi-join for candidates → exact cosine
    verify. Avoids the O(n²) cross join; bucket skew handled by AQE."""
    import random

    dim_probe = embeddings.select(F.size(vec_col).alias("d")).limit(1)
    dim = dim_probe.collect()[0]["d"]  # scalar metadata fetch, not data collect
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]

    sketch_bits = [
        (
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("int")
        for plane in planes
    ]
    bits_per_band = num_planes // bands
    band_cols = []
    for b in range(bands):
        expr = F.lit(0)
        for i in range(bits_per_band):
            expr = expr * 2 + sketch_bits[b * bits_per_band + i]
        band_cols.append(expr.alias(f"band_{b}"))
    sk = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), *band_cols)
    cand = None
    for b in range(bands):
        x = sk.select("id", "v", F.col(f"band_{b}").alias("bk"))
        pair = (
            x.alias("x")
            .join(x.alias("y"), (F.col("x.bk") == F.col("y.bk")) & (F.col("x.id") < F.col("y.id")))
            .select(
                F.col("x.id").alias("id_a"),
                F.col("y.id").alias("id_b"),
                F.col("x.v").alias("va"),
                F.col("y.v").alias("vb"),
            )
        )
        cand = pair if cand is None else cand.unionByName(pair)
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine_sim", F.round(cosine_sim(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    round_digits: int | None = 4,
) -> DataFrame:
    """k-NN join: for EVERY query vector, its top-k candidates by cosine.

    The query batch is broadcast (one scan of the candidate side serves
    all queries); per-query ranking is a window keyed on the query id, so
    the shuffle carries |candidates|·|queries| scored rows hashed by qid.
    That product is the operator's scale bound — for query batches too
    large to broadcast, switch to ``ivf_topk`` per centroid block (the
    IVF route prunes candidates before scoring instead of after).

    Result: (qid, id, cosine_sim), ≤ k rows per qid, deterministic
    tie-break on id.
    """
    sim = cosine_sim(F.col(vec_col), F.col(qvec_col))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = embeddings.join(F.broadcast(queries)).select(
        F.col(qid_col), F.col(id_col), sim.alias("cosine_sim")
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine_sim"), id_col)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
