"""Corpus-curation workload: semantic clustering, cluster-blocked dedup,
cluster-balanced sampling, PII redaction.

These compose the fixed-point k-means operator (operators/clustering.py)
into the curation moves a training-data pipeline actually runs: bucket
the corpus semantically, dedup WITHIN buckets (linear, not quadratic),
rebalance the training mix per bucket, and scrub PII before export.
All arithmetic is engine-exact (fixed-point distances, portable floor
division, rounded cosine edges), so every query has a full value-level
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.hashing import hash60, hash60_sql
from delta_unity_duckdb_spark.operators import clustering as C
from delta_unity_duckdb_spark.operators.similarity import cosine_sim
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query

_K = 8
_ITERS = 2


# ------------------------------------------------------------- clustering
@query(
    "kmeans_clusters",
    oracle=f"""
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MIN(vid) AS BIGINT) AS min_vec_id,
           CAST(SUM(dist) AS BIGINT) AS wss
    FROM ({C.kmeans_sql(k=_K, iters=_ITERS)})
    GROUP BY cid ORDER BY cid
    """,
)
def kmeans_clusters(spark, sf_dir):
    """Deterministic fixed-point k-means (k=8, 2 iterations) over the
    embedding corpus: per-cluster size, representative id, and exact
    integer within-cluster sum of squares. The oracle replays the
    IDENTICAL iterations — an iterative ML algorithm under a full
    value-level differential check."""
    e = load_table(spark, sf_dir, "embeddings")
    a = C.kmeans_fixed_point(e, k=_K, iters=_ITERS)
    return (
        a.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.min("vid").cast("bigint").alias("min_vec_id"),
            F.sum("dist").cast("bigint").alias("wss"),
        )
        .withColumn("cid", F.col("cid").cast("bigint"))
        .orderBy("cid")
    )


@query(
    "semantic_dedup_blocks",
    oracle=f"""
    WITH assign AS (
      SELECT vid, cid FROM ({C.kmeans_sql(k=_K, iters=_ITERS)})
    ),
    ev AS (
      SELECT a.cid, e.vec_id, e.embedding FROM embeddings e
      JOIN assign a ON e.vec_id = a.vid)
    SELECT x.vec_id AS id_a, y.vec_id AS id_b, CAST(x.cid AS BIGINT) AS cid,
           ROUND(
             list_sum(list_transform(list_zip(x.embedding, y.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (SQRT(list_sum(list_transform(x.embedding,
                      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                * SQRT(list_sum(list_transform(y.embedding,
                      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
             4) AS cosine_sim
    FROM ev x JOIN ev y ON x.cid = y.cid AND x.vec_id < y.vec_id
    WHERE ROUND(
             list_sum(list_transform(list_zip(x.embedding, y.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (SQRT(list_sum(list_transform(x.embedding,
                      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                * SQRT(list_sum(list_transform(y.embedding,
                      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
             4) >= 0.3
    ORDER BY id_a, id_b LIMIT 1000
    """,
)
def semantic_dedup_blocks(spark, sf_dir):
    """Cluster-blocked near-dup pairs: candidate pairs are generated ONLY
    within a k-means cluster, replacing the quadratic all-pairs join with
    k block-local joins (the semantic analogue of LSH banding — at 100 TB
    the equi-join on cid is the candidate generator, and block size is
    bounded by the cluster balance the sampler below enforces)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = C.kmeans_fixed_point(e, k=_K, iters=_ITERS).select("vid", "cid")
    ev = e.join(a, e["vec_id"] == a["vid"]).select("cid", "vec_id", "embedding")
    x = ev.select(
        F.col("cid"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    y = ev.select(
        F.col("cid").alias("cid2"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    sim = F.round(cosine_sim(F.col("va"), F.col("vb")), 4)
    return (
        x.join(y, (x["cid"] == y["cid2"]) & (x["id_a"] < y["id_b"]))
        .select(
            "id_a", "id_b", F.col("cid").cast("bigint").alias("cid"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.3)
        .orderBy("id_a", "id_b")
        .limit(1000)
    )


@query(
    "cluster_balanced_sample",
    oracle=f"""
    WITH assign AS (
      SELECT vid, cid FROM ({C.kmeans_sql(k=_K, iters=_ITERS)})
    ),
    ranked AS (
      SELECT vid, cid,
             ROW_NUMBER() OVER (PARTITION BY cid
                                ORDER BY {hash60_sql("CAST(vid AS VARCHAR)")}, vid)
               AS rn
      FROM assign)
    SELECT CAST(cid AS BIGINT) AS cid,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(vid) AS BIGINT) AS min_vec_id,
           CAST(MAX(vid) AS BIGINT) AS max_vec_id
    FROM ranked WHERE rn <= 32
    GROUP BY cid ORDER BY cid
    """,
)
def cluster_balanced_sample(spark, sf_dir):
    """Cluster-balanced downsampling for training-mix control: keep at
    most 32 vectors per semantic cluster, chosen by a deterministic
    portable hash order (not head-of-partition order, which would bias
    toward whatever sorted first). The cap bounds every cluster's
    contribution regardless of how skewed the corpus is."""
    e = load_table(spark, sf_dir, "embeddings")
    a = C.kmeans_fixed_point(e, k=_K, iters=_ITERS).select("vid", "cid")
    w = Window.partitionBy("cid").orderBy(
        hash60(F.col("vid").cast("string")), "vid"
    )
    return (
        a.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 32)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.min("vid").cast("bigint").alias("min_vec_id"),
            F.max("vid").cast("bigint").alias("max_vec_id"),
        )
        .withColumn("cid", F.col("cid").cast("bigint"))
        .orderBy("cid")
    )


# ------------------------------------------------------------ PII redact
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "pii_redact",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(length(regexp_replace(regexp_replace(text,
                  '{_EMAIL_RE}', '<EMAIL>', 'g'),
                  '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
    FROM dirty ORDER BY doc_id LIMIT 500
    """,
)
def pii_redact(spark, sf_dir):
    """PII scrubbing before corpus export: detect + mask emails and phone
    numbers, report per-doc match counts and the redacted length. The
    fixture text is synthetic word soup, so a deterministic dirty twin
    (same concat in the oracle) injects one email + one phone per doc —
    the regexes and replacement are the operator under test. Pure
    JVM-side regexp (no UDF); at 100 TB this is a narrow map with zero
    shuffles."""
    d = load_table(spark, sf_dir, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return (
        dirty.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0))
            .cast("bigint")
            .alias("n_emails"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), 0))
            .cast("bigint")
            .alias("n_phones"),
            F.length(redacted).cast("bigint").alias("redacted_len"),
        )
        .orderBy("doc_id")
        .limit(500)
    )
