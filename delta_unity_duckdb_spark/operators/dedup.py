"""Deduplication operators for training-data pipelines (SURVEY.md §2-E).

- ``dedup_exact``: exact duplicate removal with a deterministic survivor
  (window row_number, not ``dropDuplicates`` whose survivor is
  partition-order-dependent — unacceptable for reproducible 100 TB runs).
- ``minhash_near_dups``: MinHash + LSH banding near-duplicate pairs, pure
  DataFrame ops (shingle → hash → min-per-permutation → band → bucket join)
  — no cross join; candidate generation is an equi-join on (band, signature).
- ``simhash_near_dups``: 64-bit SimHash fingerprint + banded equality join.
- ``ngram_jaccard``: exact n-gram Jaccard over candidate pairs.

Scale posture: every step is a keyed shuffle or map-side transform; the
only join keys are LSH buckets, so the candidate set stays near-linear for
natural corpora. Skewed buckets (boilerplate shingles) are handled by AQE
skew-join plus the ``max_bucket_size`` guard that drops degenerate buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Large primes for the universal-hash family h_i(x) = (a_i*x + b_i) mod p.
_MERSENNE_P = (1 << 61) - 1


def dedup_exact(
    df: DataFrame, cols: list[str], order_col: str
) -> DataFrame:
    """Keep one deterministic survivor per duplicate group (first by
    ``order_col``). E1 — exact hash-groupBy dedup."""
    w = Window.partitionBy(*cols).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _shingles(text_col, n: int = 3):
    """Word n-gram shingles as an array column (JVM-side, no UDF)."""
    words = F.split(F.lower(text_col), r"\s+")
    # transform over sliding offsets: shingle i = words[i..i+n-1]
    return F.filter(
        F.transform(
            words,
            lambda _, i: F.when(
                i + n <= F.size(words), F.concat_ws(" ", F.slice(words, i + 1, n))
            ),
        ),
        lambda x: x.isNotNull(),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, perm, minhash) — one row per document per permutation.

    Shingles are hashed JVM-side (xxhash64); each permutation applies a
    universal hash and takes the min via ``F.array_min`` — all map-side,
    zero shuffles until the caller aggregates.
    """
    import random

    # 31-bit hash inputs and coefficients keep a*h + b < 2^62 — no long
    # overflow under ANSI arithmetic, at any scale.
    rng = random.Random(seed)
    perms = [(rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31)) for _ in range(num_perm)]

    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles(F.col(text_col), shingle_n)).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    hashed = sh.select(
        "id",
        F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 31))).alias("hs"),
    )
    sig_cols = [
        F.array_min(
            F.transform("hs", lambda h: (h * a + b) % F.lit(_MERSENNE_P))
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(perms)
    ]
    wide = hashed.select("id", *sig_cols)
    # long-form for banding
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("perm"), F.col(f"mh_{i}").alias("mh"))
            for i in range(num_perm)
        ]
    )
    return wide.select("id", F.explode(pairs).alias("pm")).select(
        "id", F.col("pm.perm").alias("perm"), F.col("pm.mh").alias("mh")
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    rows/band = num_perm/bands; two docs collide if any band's full
    signature slice matches. Bucket join replaces the quadratic cross join;
    ``max_bucket_size`` drops degenerate buckets (boilerplate) that would
    otherwise explode quadratically — dropped buckets are reported by the
    caller via counts, never silently at scale.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n, seed)
    banded = (
        sigs.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("perm", "mh"))).alias("sig"))
        .withColumn("bucket", F.xxhash64(F.to_json(F.struct("band", "sig"))))
        .select("id", "band", "bucket")
    )
    bucket_sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("sz"))
    small = bucket_sizes.filter(F.col("sz") <= max_bucket_size).select("band", "bucket")
    b = banded.join(small, ["band", "bucket"])
    a1, a2 = b.alias("x"), b.alias("y")
    return (
        a1.join(
            a2,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def simhash64(text_col, shingle_n: int = 2):
    """64-bit SimHash of word n-grams, pure JVM expressions: per-shingle
    xxhash64, per-bit majority vote via bit arithmetic in an aggregate fold."""
    sh = F.array_distinct(_shingles(text_col, shingle_n))
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # For each of 64 bits: count of set bits*2 > n → bit set in fingerprint.
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, bit).bitwiseAND(F.lit(1)).cast("int"),
        )
        for bit in range(64)
    ]
    n = F.size(sh)
    fp = F.lit(0).cast("long")
    for bit, votes in enumerate(bit_votes):
        fp = fp + F.when(votes * 2 > n, F.lit(1).cast("long") * (2**bit if bit < 63 else -(2**63))).otherwise(0)
    return fp


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, bands: int = 4
) -> DataFrame:
    """Near-dup candidates where a 16-bit SimHash band matches exactly
    (Hamming-distance blocking). Equi-join on (band, chunk) — no cross join."""
    fp = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("fp"))
    bits = 64 // bands
    chunks = fp.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("fp", i * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "bc.band", "bc.chunk")
    x, y = chunks.alias("x"), chunks.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity over candidate pairs (verification stage
    after LSH blocking). Joins shingle sets to the (id_a, id_b) pairs and
    computes |∩|/|∪| with array intrinsics — no UDF."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact (id_a < id_b) pairs with cosine similarity >= threshold.

    This is the brute-force verification kernel: an all-pairs theta join.
    Use it directly only on small / pre-blocked inputs; at scale, feed it
    the candidate pairs from ``similarity.cosine_pairs_lsh`` (random-
    hyperplane LSH blocking) instead of the full table — the blocked path
    is near-linear, this one is quadratic by construction.
    """
    from delta_unity_duckdb_spark.operators.similarity import cosine_sim

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = cosine_sim(F.col("va"), F.col("vb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def dedup_embedding_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal (E2, embedding flavor).

    Semantics: a row is DROPPED iff some row with a smaller id is within
    ``threshold`` cosine similarity of it — the greedy smallest-id-wins
    rule (chain drops included), which is deterministic and engine-
    independent, unlike connected-component canonicalization which would
    need an iterative fixpoint.

    ``candidates``: optional pre-blocked (id_a, id_b) pair DataFrame (from
    LSH); when given, only those pairs are similarity-checked — the 100 TB
    path. When None, exact all-pairs (small inputs / oracle checks only).
    """
    if candidates is None:
        dups = embedding_cosine_pairs(df, id_col, vec_col, threshold)
    else:
        v = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        from delta_unity_duckdb_spark.operators.similarity import cosine_sim

        dups = (
            candidates.join(v.withColumnsRenamed({"__id": "id_a", "__v": "va"}), "id_a")
            .join(v.withColumnsRenamed({"__id": "id_b", "__v": "vb"}), "id_b")
            .select("id_a", "id_b", F.round(cosine_sim(F.col("va"), F.col("vb")), 4).alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold)
        )
    drop_ids = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop_ids, id_col, "left_anti")


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Near-dup CLUSTERING: pairwise candidates alone under-remove —
    if A~B and B~C but A≁C, pair-based removal can keep two of the three.
    Cluster by connected components over the MinHash candidate graph and
    keep one survivor (min id) per component: transitive closure, exactly
    one representative per duplicate family.

    Returns (id, cluster, is_survivor). Pipeline: MinHash+LSH pairs
    (banded, no cross join) → connected_components (pointer jumping,
    O(log diameter) rounds) → left join back so non-duplicate docs stay
    their own singleton cluster.
    """
    from delta_unity_duckdb_spark.operators.graph import connected_components

    pairs = minhash_near_dups(df, id_col, text_col, num_perm=num_perm, bands=bands)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges)  # (node, component) for dup members only
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, F.col("id") == comp.node, "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("cluster"),
        )
        .withColumn("is_survivor", F.col("id") == F.col("cluster"))
    )
