"""LLM-pipeline operator queries (SURVEY.md §2-E) with DuckDB oracles.

Exact-SQL-expressible ops get full oracle twins; LSH-based ops register
rows-only (driver records the weaker check) but are exercised against exact
recomputation in tests/.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.hashing import hash60_sql
from delta_unity_duckdb_spark.operators import dedup as D
from delta_unity_duckdb_spark.operators import similarity as S
from delta_unity_duckdb_spark.operators import text as T
from delta_unity_duckdb_spark.operators.text import space_tokens
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query


# ---------------------------------------------------------------- E1: exact dedup
@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn = 1 ORDER BY doc_id LIMIT 1000
    """,
)
def dedup_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        D.dedup_exact(d, ["text"], "doc_id")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
        .limit(1000)
    )


# ---------------------------------------------------------------- E5: word count
@query(
    "wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n FROM (
      SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word LIMIT 50
    """,
)
def wordcount(spark, sf_dir):
    """Classic explode→groupBy count; partial aggregation collapses the
    exploded rows map-side before the word shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


# ---------------------------------------------------------------- E6: corpus profile
@query(
    "lang_profile",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source
    """,
)
def lang_profile(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------- E5: token counting
@query(
    "token_counts",
    oracle="""
    SELECT doc_id,
           CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS BIGINT) AS n_tokens_ws
    FROM documents ORDER BY doc_id LIMIT 500
    """,
)
def token_counts(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.whitespace_token_count(F.col("text")).alias("n_tokens_ws"))
        .orderBy("doc_id")
        .limit(500)
    )


# ---------------------------------------------------------------- E: quality + lang-id + fingerprint
@query(
    "text_profile",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             LENGTH(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS toks,
             LENGTH(regexp_replace(text, '[A-Za-z0-9 \t\n\x0B\f\r]', '', 'g')) AS punct
      FROM documents),
    scored AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens_ws,
             CAST(COALESCE(list_sum(list_transform(
                    regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]'),
                    p -> CAST(CEIL(LENGTH(p) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_tokens_bpe,
             CAST(FLOOR((LEAST(n_chars / 200.0, 1.0)
                    + (1.0 - LEAST(punct / GREATEST(n_chars, 1) * 5.0, 1.0))
                    + CASE WHEN len(toks) > 0
                           THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                           ELSE 0.0 END) / 3.0 * 10000) AS BIGINT) AS quality_e4,
             list_max([
               struct_pack(score := CAST(len(list_intersect(list_distinct(toks), ['the','and','of','to','in','is','that','it'])) AS DOUBLE) / 8.0, lang := 'en'),
               struct_pack(score := CAST(len(list_intersect(list_distinct(toks), ['der','die','das','und','ist','nicht','ein','zu'])) AS DOUBLE) / 8.0, lang := 'de'),
               struct_pack(score := CAST(len(list_intersect(list_distinct(toks), ['le','la','les','et','est','un','une','que'])) AS DOUBLE) / 8.0, lang := 'fr'),
               struct_pack(score := CAST(len(list_intersect(list_distinct(toks), ['el','la','los','y','es','un','una','que'])) AS DOUBLE) / 8.0, lang := 'es'),
               struct_pack(score := CAST(len(list_intersect(list_distinct(toks), ['的','是','了','在','我','有','和','不'])) AS DOUBLE) / 8.0, lang := 'zh')
             ]) AS best,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(toks,
                   tk -> (CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) % 2147483648))),
               (acc, h) -> (acc * 31 + h) % 72057594037927936) AS fingerprint
      FROM t)
    SELECT doc_id, n_tokens_ws, n_tokens_bpe, quality_e4,
           CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred,
           fingerprint
    FROM scored ORDER BY doc_id LIMIT 500
    """,
)
def text_profile(spark, sf_dir):
    """One-pass doc profile: whitespace + BPE-ish token counts, floor-
    quantized quality, stopword-profile language ID, and the md5-portable
    rolling-hash fingerprint — every column now engine-exact, so the whole
    profile is oracle-checked (round 1 kept it rows-only because the
    fingerprint used Spark-private xxhash64)."""
    d = load_table(spark, sf_dir, "documents")
    return T.text_profile(d).orderBy("doc_id").limit(500)


# ---------------------------------------------------------------- E3: cosine top-k
@query(
    "similarity_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(
             list_sum(list_transform(list_zip(e.embedding, q.qvec),
                                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * SQRT(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             4) AS cosine_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY cosine_sim DESC, e.vec_id LIMIT 10
    """,
)
def similarity_topk(spark, sf_dir):
    """Brute-force exact cosine top-k vs the vec_id=0 vector (E3 baseline)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return S.cosine_topk(e.filter(F.col("vec_id") != 0), q, k=10)


# ---------------------------------------------------------------- E2/E4: LSH ops
@query(
    "minhash_near_dups",
    oracle=f"""
    WITH pairs AS ({D.minhash_pairs_sql(num_perm=32, bands=8)})
    SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b LIMIT 1000
    """,
)
def minhash_near_dups(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (E2). The md5-portable shingle
    hash (functions/hashing.py) makes the signatures — and therefore the
    candidate pairs — engine-exact, so the DuckDB oracle computes the
    IDENTICAL banding (operators/dedup.py minhash_pairs_sql shares the
    constants); recall vs exact Jaccard stays asserted in tests."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(d, "doc_id", "text", num_perm=32, bands=8)
    return pairs.orderBy("id_a", "id_b").limit(1000)


@query(
    "incremental_near_dup_ingest",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    inc AS (
      SELECT doc_id + 500000 AS doc_id, text FROM documents
      WHERE doc_id % 7 = 0),
    bc AS ({D.minhash_banded_sql('corpus', 'doc_id', 'text', num_perm=32, bands=8)}),
    bi AS ({D.minhash_banded_sql('inc', 'doc_id', 'text', num_perm=32, bands=8)}),
    small AS (
      SELECT band, sigstr FROM bc GROUP BY band, sigstr
      HAVING COUNT(*) <= 1000),
    cand AS (
      SELECT DISTINCT i.id AS new_id, c.id AS corpus_id
      FROM bi i
      JOIN small s ON i.band = s.band AND i.sigstr = s.sigstr
      JOIN bc c ON c.band = s.band AND c.sigstr = s.sigstr),
    verdict AS (
      SELECT i.doc_id AS new_id, MIN(c.corpus_id) AS dup_of
      FROM inc i LEFT JOIN cand c ON c.new_id = i.doc_id
      GROUP BY i.doc_id)
    SELECT new_id, CAST(dup_of AS BIGINT) AS dup_of,
           dup_of IS NOT NULL AS is_dup
    FROM verdict ORDER BY new_id LIMIT 500
    """,
)
def incremental_near_dup_ingest(spark, sf_dir):
    """Incremental ingest dedup — the operation a LIVE 100 TB corpus runs
    every batch: a re-crawl increment (every 7th doc under a new id) is
    checked for near-duplicates against the EXISTING corpus by joining
    the increment's LSH band buckets against the corpus's persisted
    bucket index (``minhash_band_buckets`` — the frame a deployment
    stores). The candidate join is increment × corpus through bucket
    equality ONLY: no corpus self-pairing, no re-sketching of history,
    cost linear in the increment. Degenerate corpus buckets (> 1000
    members — boilerplate) are dropped by the census exactly as in
    ``minhash_near_dups``; each new doc reports its lowest-id corpus
    duplicate or none. Re-crawled texts are byte-identical so their
    signatures collide on every band — the expected verdict, replayed
    value-for-value by the oracle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    inc = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 500000
    )
    bc = D.minhash_band_buckets(
        d, "doc_id", "text", num_perm=32, bands=8
    ).localCheckpoint(eager=True, storageLevel=CKPT_DESER)
    bi = D.minhash_band_buckets(inc, "doc_id", "text", num_perm=32, bands=8)
    small = (
        bc.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") <= 1000)
        .select("band", "bucket")
    )
    cand = (
        bi.withColumnRenamed("id", "new_id")
        .join(small, ["band", "bucket"])
        .join(bc.withColumnRenamed("id", "corpus_id"), ["band", "bucket"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    return (
        inc.select(F.col("doc_id").alias("new_id"))
        .join(cand, "new_id", "left")
        .groupBy("new_id")
        .agg(F.min("corpus_id").cast("bigint").alias("dup_of"))
        .withColumn("is_dup", F.col("dup_of").isNotNull())
        .orderBy("new_id")
        .limit(500)
    )


@query(
    "dedup_pipeline_exact_first",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000000 AS doc_id, text FROM documents
      WHERE doc_id % 5 = 0),
    survivors AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM corpus) t
      WHERE rn = 1),
    pairs AS ({D.minhash_pairs_sql('survivors', 'doc_id', 'text',
                                   num_perm=32, bands=8)})
    SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b LIMIT 1000
    """,
)
def dedup_pipeline_exact_first(spark, sf_dir):
    """E1+E2 composition in PRODUCTION pipeline order: hash-exact dedup
    first (keyed window, linear, no pair join), MinHash+LSH near-dup
    candidates second — over the exact survivors only.

    Why the order matters (the round-6 sf100 lesson,
    tools/bench_dedup_clique.py): any near-dup detector's candidate-PAIR
    output is inherently Θ(clique²) per duplicate clique, so a crawl
    where each doc exists as 1000 verbatim copies makes the pair answer
    itself ~2.5e9 rows for ANY engine. Collapsing verbatim cliques to
    one deterministic survivor each (min id) FIRST keeps the whole
    pipeline linear and preserves the true near-dup pairs of the base
    corpus — the sf100 measurement was 5 M docs → 4,992 survivors →
    8,301 pairs in 5.7 s end-to-end, vs spill-disk exhaustion in
    pair-first order.

    The fixture corpus has few verbatim duplicates below sf100, so the
    query injects them: every 5th doc is unioned back under id + 1e10
    (same move as ``incremental_near_dup_ingest``; the offset clears the
    ~1e7 id range of the replicated sf100 fixture so injected ids never
    collide with real ones). Exact dedup must eliminate every injected
    copy (survivor = original, smaller id) — a pair touching an id >=
    1e10 would prove the exact stage failed, and the oracle replays the
    identical survivor set and banding.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionAll(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + F.lit(10_000_000_000)).alias("doc_id"), "text"
        )
    )
    survivors = D.dedup_exact(corpus, ["text"], "doc_id")
    pairs = D.minhash_near_dups(
        survivors, "doc_id", "text", num_perm=32, bands=8
    )
    return pairs.orderBy("id_a", "id_b").limit(1000)


@query(
    "simhash_near_dups",
    oracle=f"""
    WITH pairs AS ({D.simhash_pairs_sql()})
    SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b LIMIT 1000
    """,
)
def simhash_near_dups(spark, sf_dir):
    """SimHash banded near-dup candidates (E2) — md5-portable fingerprint,
    oracle computes the identical per-bit majority votes and band chunks."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(d, "doc_id", "text").orderBy("id_a", "id_b").limit(1000)


@query(
    "embedding_pairs_lsh",
    oracle=f"""
    WITH lsh AS ({S.cosine_pairs_lsh_sql(dim=64, threshold=0.35, num_planes=24, bands=6)})
    SELECT id_a, id_b, cosine_sim FROM lsh ORDER BY id_a, id_b LIMIT 1000
    """,
)
def embedding_pairs_lsh(spark, sf_dir):
    """Random-hyperplane LSH similarity join (E4), exact-verified ≥0.35.

    The hyperplanes are a seeded shared definition
    (operators/similarity.py lsh_planes), so the DuckDB oracle computes
    the IDENTICAL sign-bit sketch, banding, and rounded cosine verify —
    a full value check of the approximate path, not just a recall bound.
    The fixture embeddings are near-orthogonal random vectors (max
    pairwise cosine ≈ 0.46), so the threshold sits below that to make the
    check non-vacuous; production near-dup thresholds (0.9+) just change
    the constant."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        S.cosine_pairs_lsh(e, threshold=0.35, num_planes=24, bands=6)
        .orderBy("id_a", "id_b")
        .limit(1000)
    )


@query(
    "similarity_topk_ivf",
    oracle=S.ivf_topk_sql(k=10, nlist=16, nprobe=4),
)
def similarity_topk_ivf(spark, sf_dir):
    """IVF-style approximate top-k (E3 scale path): probe the nprobe
    nearest of nlist centroid partitions instead of scanning everything.
    The centroid sample, assignment tie-breaks, and probe set are all
    deterministic arithmetic, so the DuckDB oracle replays the exact
    same approximate search (operators/similarity.py ivf_topk_sql);
    recall vs brute force stays asserted in tests."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return S.ivf_topk(e.filter(F.col("vec_id") != 0), q, k=10, nlist=16, nprobe=4)


@query(
    "ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, CAST(n_chars // 100 AS INTEGER) AS band,
             list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS ts
      FROM documents
    ),
    nz AS (SELECT * FROM toks WHERE len(ts) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.ts, b.ts))), 4) AS jaccard
    FROM nz a JOIN nz b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    ORDER BY jaccard DESC, id_a, id_b LIMIT 100
    """,
)
def ngram_jaccard(spark, sf_dir):
    """Exact token-set Jaccard over blocked candidate pairs (E: n-gram
    Jaccard dedup). Blocking on (lang, length-band) keeps the self-join
    near-linear — the full cross join never materializes; at 100 TB the
    block key would be an LSH band instead."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("int").alias("band"),
        F.array_distinct(
            space_tokens("text")
        ).alias("ts"),
    ).filter(
        # zero-token docs (NULL/empty/all-space text) have no defined
        # Jaccard (0/0) — exclude them on BOTH sides (oracle: len(ts) > 0)
        # instead of dividing by an empty union (ANSI DIVIDE_BY_ZERO,
        # adversarial-values sweep)
        F.size("ts") > 0
    )
    a, b = toks.alias("a"), toks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.ts", "b.ts")).cast("double")
                / F.size(F.array_union("a.ts", "b.ts")),
                4,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(100)
    )


@query(
    "quality_scores",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             LENGTH(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS toks,
             LENGTH(regexp_replace(text, '[A-Za-z0-9 \t\n\x0B\f\r]', '', 'g')) AS punct
      FROM documents)
    SELECT doc_id,
           CAST(FLOOR((LEAST(n_chars / 200.0, 1.0)
                  + (1.0 - LEAST(punct / GREATEST(n_chars, 1) * 5.0, 1.0))
                  + CASE WHEN len(toks) > 0
                         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                         ELSE 0.0 END) / 3.0 * 10000) AS BIGINT) AS quality_e4
    FROM t ORDER BY doc_id LIMIT 500
    """,
)
def quality_scores(spark, sf_dir):
    """Document quality heuristic (length / punctuation-density / word
    diversity), all JVM column expressions — hash-checked against the same
    formula in DuckDB SQL. Exported FLOOR-quantized (engine-stable on the
    bit-identical raw double; ROUND's half-way tie-break is not)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.floor(T.quality_score_raw(F.col("text")) * 10000)
            .cast("long")
            .alias("quality_e4"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT o_orderkey,
           ROUND(LN(1.0 + o_totalprice) * 100.0, 4) AS scaled
    FROM orders ORDER BY o_orderkey LIMIT 500
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """The engine's UDF surface (SURVEY.md §2-C note): an Arrow-vectorized
    scalar pandas_udf — numpy over columnar batches, ~10-100x faster than
    row-at-a-time Python UDFs, and the ONLY sanctioned way to run custom
    Python in a hot path. Oracle-checked because the transform is pure."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # No type hints: `from __future__ import annotations` stringifies them,
    # and pyspark can't resolve 'pd.Series' against a function-local import.
    @pandas_udf("double")
    def log_scale(v):
        import numpy as np

        return pd.Series(np.round(np.log1p(v.to_numpy()) * 100.0, 4))

    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", log_scale("o_totalprice").alias("scaled"))
        .orderBy("o_orderkey")
        .limit(500)
    )


# shared CTE: stopword-profile language ID with true label riding along
_LANG_ID_SQL = r"""
    WITH t AS (
      SELECT doc_id, lang AS lang_true,
             list_distinct(list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                                       x -> x <> '')) AS toks
      FROM documents),
    scored AS (
      SELECT doc_id, lang_true,
             list_max([
               struct_pack(score := CAST(len(list_intersect(toks, ['the','and','of','to','in','is','that','it'])) AS DOUBLE) / 8.0, lang := 'en'),
               struct_pack(score := CAST(len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu'])) AS DOUBLE) / 8.0, lang := 'de'),
               struct_pack(score := CAST(len(list_intersect(toks, ['le','la','les','et','est','un','une','que'])) AS DOUBLE) / 8.0, lang := 'fr'),
               struct_pack(score := CAST(len(list_intersect(toks, ['el','la','los','y','es','un','una','que'])) AS DOUBLE) / 8.0, lang := 'es'),
               struct_pack(score := CAST(len(list_intersect(toks, ['的','是','了','在','我','有','和','不'])) AS DOUBLE) / 8.0, lang := 'zh')
             ]) AS best
      FROM t)
    SELECT doc_id, lang_true,
           CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
    FROM scored"""


@query("lang_id", oracle=_LANG_ID_SQL + " ORDER BY doc_id LIMIT 1000")
def lang_id(spark, sf_dir):
    """n-gram/stopword language ID (E5): per-language profile hit ratio,
    argmax via array_max over (score, lang) structs — lexicographic struct
    comparison ties out identically in both engines, hash-checked against
    the true lang column riding along."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.col("lang").alias("lang_true"),
            T.detect_language(F.col("text")).alias("lang_pred"),
        )
        .orderBy("doc_id")
        .limit(1000)
    )


@query(
    "token_counts_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(COALESCE(list_sum(list_transform(
                  regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]'),
                  p -> CAST(CEIL(LENGTH(p) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_tokens_bpe
    FROM documents ORDER BY doc_id LIMIT 500
    """,
)
def token_counts_bpe(spark, sf_dir):
    """Subword-ish (BPE-style) token estimate: regexp pre-tokenize, one
    token per started 4 characters — deterministic stand-in for a real BPE
    vocab, hash-checked against the identical formula in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.bpe_ish_token_count(F.col("text")).alias("n_tokens_bpe"))
        .orderBy("doc_id")
        .limit(500)
    )


@query(
    "embedding_dedup_cosine",
    oracle="""
    WITH sims AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               4) AS cosine_sim
      FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b ON a.vec_id < b.vec_id
    ),
    drops AS (SELECT DISTINCT id_b FROM sims WHERE cosine_sim >= 0.42)
    SELECT e.vec_id, e.label
    FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e LEFT JOIN drops d ON e.vec_id = d.id_b
    WHERE d.id_b IS NULL
    ORDER BY e.vec_id
    """,
)
def embedding_dedup_cosine(spark, sf_dir):
    """Embedding-cosine near-dup dedup (E2, embedding flavor): drop every
    vector with a smaller-id neighbor at cosine >= 0.42 (greedy smallest-
    id-wins; 0.42 is a demo threshold — the fixture corpus has no true
    dups, max pairwise cosine ~0.51). Exact all-pairs here for the oracle;
    at scale the same operator takes LSH candidates (``cosine_pairs_lsh``)
    instead of the quadratic join — see dedup.dedup_embedding_cosine."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        # vector ops consider only rows WITH a vector (mirrored in the oracle)
        F.col("embedding").isNotNull()
    )
    return (
        D.dedup_embedding_cosine(e, "vec_id", "embedding", 0.42)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
                    * CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE))
           AS weighted_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark, sf_dir):
    """Grouped-aggregate pandas_udf — the second half of the engine's UDF
    surface (scalar half: ``udf_pandas_scalar``): a custom Python aggregate
    that Spark runs as partial Arrow batches per group, here a
    quantity-weighted mean price. Floats sum in nondeterministic partition
    order, so the UDF does the arithmetic in exact int64 cents — the only
    formulation that hash-matches an oracle (and reproduces run-to-run on a
    real cluster) regardless of partitioning."""
    from pyspark.sql.functions import pandas_udf

    # pd.Series/float hints (resolved against the module-level pandas
    # import) are what tell pandas_udf this is a GROUPED_AGG, not SCALAR.
    def weighted_price(price: pd.Series, qty: pd.Series) -> float:
        import numpy as np

        p = price.to_numpy(dtype="float64")
        q0 = qty.to_numpy(dtype="float64")
        # SQL-NULL semantics, exactly as the oracle computes them: the
        # numerator SUM skips rows where EITHER factor is NULL (NULL
        # product), the denominator SUM skips only NULL quantities. An
        # unmasked np.rint(NaN).astype(int64) is INT64_MIN garbage —
        # the round-8 adversarial-values sweep measured -1.8e11 from it.
        num_m = ~(np.isnan(p) | np.isnan(q0))
        den_m = ~np.isnan(q0)
        den = float(np.rint(q0[den_m]).astype(np.int64).sum())
        # SUM over an all-NULL (or zero-weight) group divides by 0 in
        # SQL and yields NULL, not a ZeroDivisionError.
        if den == 0.0:
            return None
        cents = np.rint(p[num_m] * 100.0).astype(np.int64)
        q = np.rint(q0[num_m]).astype(np.int64)
        return float((cents * q).sum()) / (100.0 * den)

    wp = pandas_udf(weighted_price, "double")
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        wp("l_extendedprice", "l_quantity").alias("weighted_price")
    )


# ---------------------------------------------------------------- E3: k-NN join (batch of queries)
@query(
    "knn_join",
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
               WHERE vec_id < 5 AND embedding IS NOT NULL),
         c AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id >= 5 AND embedding IS NOT NULL),
         sims AS (
           SELECT q.qid, c.vec_id,
                  ROUND(
                    list_sum(list_transform(list_zip(c.embedding, q.qvec),
                                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                    / (SQRT(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       * SQRT(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                    4) AS cosine_sim
           FROM c CROSS JOIN q),
         ranked AS (
           SELECT qid, vec_id, cosine_sim,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, vec_id) AS rn
           FROM sims)
    SELECT qid, vec_id, cosine_sim FROM ranked WHERE rn <= 3
    """,
)
def knn_join_q(spark, sf_dir):
    """Batch k-NN: top-3 neighbors for each of 5 query vectors in one scan
    of the candidate side (E3 batch form — the shape of embedding-based
    retrieval/labeling jobs). Broadcast queries, window-ranked per qid."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        # vector ops consider only rows WITH a vector (mirrored in the oracle)
        F.col("embedding").isNotNull()
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return S.knn_join(e.filter(F.col("vec_id") >= 5), q, k=3)


# ---------------------------------------------------------------- E5+E1 composed: corpus curation
@query(
    "corpus_curation",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text, lang, source, n_chars,
             LENGTH(text) AS len_chars,
             list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS toks,
             LENGTH(regexp_replace(text, '[A-Za-z0-9 \t\n\x0B\f\r]', '', 'g')) AS punct
      FROM documents),
    scored AS (
      SELECT doc_id, text, lang, source, n_chars,
             (LEAST(len_chars / 200.0, 1.0)
              + (1.0 - LEAST(punct / GREATEST(len_chars, 1) * 5.0, 1.0))
              + CASE WHEN len(toks) > 0
                     THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     ELSE 0.0 END) / 3.0 AS quality
      FROM t),
    filtered AS (SELECT * FROM scored WHERE quality > 0.5),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM filtered) WHERE rn = 1)
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(FLOOR(quality * 10000) AS BIGINT)) AS BIGINT) AS sum_quality_e4
    FROM deduped GROUP BY lang, source
    """,
)
def corpus_curation(spark, sf_dir):
    """The training-data curation pipeline END-TO-END, fully oracle-checked:
    quality-score every document (JVM column expressions) → drop low
    quality (> 0.5) → exact-dedup on text (deterministic survivor) → per
    (lang, source) corpus stats.

    This is the composition the individual operators exist for; one
    registered query proves the stages agree with a reference engine when
    chained, not just in isolation. Plan: scan → scalar scoring (codegen,
    no shuffle) → dedup shuffle on text hash → stats shuffle on the tiny
    (lang, source) key; the quality filter prunes before the first
    shuffle.

    Cross-engine numerics: the raw quality double is bit-identical in
    both engines (same IEEE ops, same order), so the > 0.5 threshold is
    safe unrounded; the aggregate ships FLOOR-quantized int64 quality
    (sum_quality_e4) because integer sums are partition-order-free and
    FLOOR — unlike ROUND — has no engine-divergent tie-break."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        T.quality_score_raw(F.col("text")).alias("quality"),
    )
    filtered = scored.filter(F.col("quality") > 0.5)
    deduped = D.dedup_exact(filtered, ["text"], "doc_id")
    return deduped.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.floor(F.col("quality") * 10000).cast("long")).alias("sum_quality_e4"),
    )


@query(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({D.minhash_pairs_sql(num_perm=32, bands=8)}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach AS (
      SELECT u AS node, u AS r FROM edges
      UNION
      SELECT e.v AS node, rr.r
      FROM reach rr JOIN edges e ON e.u = rr.node),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT d.doc_id AS id,
           COALESCE(c.component, d.doc_id) AS cluster,
           (d.doc_id = COALESCE(c.component, d.doc_id)) AS is_survivor
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ORDER BY id LIMIT 2000
    """,
)
def near_dup_clusters_q(spark, sf_dir):
    """Near-dup clustering (E2 capstone): MinHash candidate pairs →
    connected components (pointer-jumping) → one survivor per duplicate
    family. Transitive closure fixes the under-removal of pair-based dedup
    (A~B~C chains). The md5-portable MinHash makes the pair graph
    engine-exact, so the oracle recomputes the same components with a
    recursive-CTE transitive closure + MIN label — a full value check of
    cluster assignment AND survivor choice; transitivity and survivor
    uniqueness stay asserted in unit tests."""
    d = load_table(spark, sf_dir, "documents")
    return (
        D.near_dup_clusters(d, "doc_id", "text")
        .orderBy("id")
        .limit(2000)
    )


# ---------------------------------------------------------------- E5: TF-IDF-style distinctive terms
@query(
    "tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS word FROM documents),
    agg AS (
      SELECT word, COUNT(*) AS tf_total, COUNT(DISTINCT doc_id) AS df
      FROM tokens WHERE word <> '' GROUP BY word)
    SELECT word, tf_total, df,
           (tf_total * 1000000) // df AS rarity_weighted_tf
    FROM agg
    ORDER BY rarity_weighted_tf DESC, word LIMIT 100
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Distinctive-term ranking (TF-IDF shape): corpus-wide term frequency
    weighted by inverse document frequency. The score is the integer
    ``tf_total * 1e6 div df`` — order-equivalent to tf * (N/df) at fixed N
    and exactly computable in int64, where a float ``tf * ln(N/df)`` would
    hinge on cross-engine libm ``ln`` agreement in the last ulp.

    Spark plan: mixing COUNT(*) with COUNT(DISTINCT doc_id) in ONE
    aggregate makes Catalyst EXPAND every exploded token row once per
    aggregate class (2× the token stream before any collapse — measured
    ~40% of wall at sf10). Splitting into two levels avoids it: level 1
    groups by (word, doc_id) — the partial aggregate collapses repeated
    tokens map-side, so the only full shuffle carries distinct (word,
    doc) pairs, not token instances; level 2 folds those pairs into
    tf_total = SUM(tf) and df = COUNT(*) per word with no expand and a
    strictly smaller exchange. Top-k is TakeOrderedAndProject — no
    global sort at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    per_doc = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        per_doc.groupBy("word")
        .agg(
            F.sum("tf").alias("tf_total"),
            F.count(F.lit(1)).alias("df"),
        )
        .withColumn("rarity_weighted_tf", F.expr("(tf_total * 1000000) div df"))
        .orderBy(F.desc("rarity_weighted_tf"), "word")
        .limit(100)
    )


# ---------------------------------------------------------------- E5: n-gram frequency
@query(
    "bigram_freq",
    oracle="""
    WITH toks AS (
      SELECT LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '') AS w
      FROM documents)
    SELECT w[i] || ' ' || w[i+1] AS bigram, COUNT(*) AS n
    FROM toks, UNNEST(RANGE(1, LEN(w))) AS t(i)
    GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50
    """,
)
def bigram_freq(spark, sf_dir):
    """Word-bigram frequency table — the n-gram statistics pass of a
    training-data pipeline (adjacent-pair counts feed contamination checks
    and boilerplate lists). Pairs are built inside the array domain
    (``transform`` over an index sequence — no self-join on position),
    then exploded; partial aggregation collapses duplicates map-side so
    the single shuffle carries distinct bigrams, not token instances.
    The ``size >= 2`` guard keeps ``sequence()`` off its descending-range
    edge case for sub-bigram docs.
    """
    d = load_table(spark, sf_dir, "documents")
    w = space_tokens("text")
    return (
        d.select(w.alias("w"))
        .select(
            F.explode(
                F.when(
                    F.size("w") >= 2,
                    F.expr(
                        "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


# ---------------------------------------------------------------- E5: repetition quality signal
@query(
    "doc_repetition",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS word FROM documents),
    tw AS (
      SELECT doc_id, word, COUNT(*) AS c FROM tokens
      WHERE word <> '' GROUP BY doc_id, word),
    perdoc AS (
      SELECT doc_id, MAX(c) AS max_tf, CAST(SUM(c) AS BIGINT) AS n_tokens
      FROM tw GROUP BY doc_id)
    SELECT doc_id, max_tf, n_tokens,
           (max_tf * 1000000) // n_tokens AS repetition_ppm
    FROM perdoc ORDER BY repetition_ppm DESC, doc_id LIMIT 100
    """,
)
def doc_repetition(spark, sf_dir):
    """Per-document repetition scoring — the max-token-share quality filter
    used to drop degenerate/templated documents from training corpora
    (a doc whose most frequent token dominates is boilerplate). Score is
    integer ppm (floor division) for engine-portable ordering.

    Spark plan: both aggregation levels key on doc_id (word is a
    sub-key of the first), so the second groupBy reuses the first's
    partitioning — one logical shuffle of token counts, then a per-doc
    fold that is map-side after AQE coalescing. No window function and
    no per-doc sort.
    """
    d = load_table(spark, sf_dir, "documents")
    tw = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        tw.groupBy("doc_id")
        .agg(F.max("c").alias("max_tf"), F.sum("c").alias("n_tokens"))
        .withColumn("repetition_ppm", F.expr("(max_tf * 1000000) div n_tokens"))
        .orderBy(F.desc("repetition_ppm"), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------- E5+: document chunking
@query(
    "doc_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '') AS w
      FROM documents WHERE LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '')) > 0),
    c AS (
      SELECT doc_id, CAST((s - 1) // 16 AS INTEGER) AS chunk_idx,
             LIST_SLICE(w, s, s + 31) AS ck
      FROM toks, UNNEST(RANGE(1, LEN(w) + 1, 16)) AS t(s))
    SELECT doc_id, chunk_idx,
           CAST(LEN(ck) AS INTEGER) AS n_chunk_tokens,
           ARRAY_TO_STRING(ck, ' ') AS chunk_text
    FROM c ORDER BY doc_id, chunk_idx LIMIT 5000
    """,
)
def doc_chunks(spark, sf_dir):
    """Sliding-window document chunking (32-token chunks, stride 16) — the
    pass that turns raw documents into overlapping training/context windows
    before tokenization or embedding. Chunk starts are generated INSIDE the
    array domain (``sequence(1, n, 16)`` + posexplode) and each chunk is a
    1-based ``slice`` of the token array, so Spark and DuckDB
    (``LIST_SLICE``, both 1-based, both end-clamped) compute byte-identical
    chunks.

    Scale: embarrassingly parallel — a narrow map over documents with no
    shuffle except the presentation ORDER BY (a production writer would
    drop it and write chunks partition-local). Output size is bounded by
    ~2x input tokens (stride = size/2), independent of document count.
    """
    d = load_table(spark, sf_dir, "documents")
    w = space_tokens("text")
    return (
        d.select("doc_id", w.alias("w"))
        # zero-token docs (NULL/empty/all-space text) produce NO chunks —
        # explicit on BOTH sides; the previous greatest(size,1) crutch
        # emitted a phantom empty chunk where the oracle's engine emitted
        # NULL-text/NULL-count rows (adversarial-values sweep)
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            F.posexplode(F.expr("sequence(1, size(w), 16)")).alias(
                "chunk_idx", "s"
            ),
            "w",
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr("slice(w, s, 32)").alias("ck"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("ck").alias("n_chunk_tokens"),
            F.array_join("ck", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
        .limit(5000)
    )


# ---------------------------------------------------------------- E5+: benchmark contamination
@query(
    "contamination_check",
    oracle="""
    WITH toks AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '') AS w
      FROM documents),
    grams AS (
      SELECT doc_id, ARRAY_TO_STRING(LIST_SLICE(w, i, i + 4), ' ') AS gram
      FROM toks, UNNEST(RANGE(1, GREATEST(LEN(w) - 4, 0) + 1)) AS t(i)),
    dg AS (SELECT DISTINCT doc_id, gram FROM grams),
    bench AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 10 = 7),
    hits AS (
      SELECT d.doc_id,
             COUNT(*) AS n_grams,
             COUNT(b.gram) AS n_contaminated
      FROM dg d LEFT JOIN bench b USING (gram)
      WHERE d.doc_id % 10 <> 7
      GROUP BY d.doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_contaminated AS BIGINT) AS n_contaminated,
           (n_contaminated * 1000000) // n_grams AS contamination_ppm
    FROM hits ORDER BY contamination_ppm DESC, doc_id LIMIT 100
    """,
)
def contamination_check(spark, sf_dir):
    """Benchmark-contamination detection: for every training document,
    the fraction (ppm, floor) of its distinct word 5-grams that also occur
    in a held-out "benchmark" slice (here ``doc_id % 10 = 7`` stands in for
    an eval set). This is the decontamination gate every serious training
    corpus runs before release.

    Spark plan: 5-grams are built in the array domain (no positional
    self-join) and deduped per doc with a per-row ``array_distinct`` —
    the per-document distinct needs NO shuffle at all, because a
    document's grams live in one row. (The earlier form shuffled every
    (doc_id, gram) pair corpus-wide to dedup them; at sf1 that moved
    ~2.4M ~40-byte strings through one exchange for a result the array
    domain computes in place — 6.8 s → ~2 s measured.) The benchmark
    gram set is deduped and **broadcast** — at 100 TB the training side
    is huge but the eval set stays a few MB of n-grams, so the
    contamination probe is a map-side hash lookup, never a sort-merge
    join of the full corpus against itself. The only shuffle left is the
    per-doc count fold, and explode keeps a doc's rows co-located so the
    partial aggregation collapses them to one row per doc before it.

    The ``array_distinct`` is applied AT THE EXPLODE SITE, not in the
    gram projection: ``explode(<plain attribute>)`` triggers Catalyst's
    InferFiltersFromGenerate, and predicate pushdown then inlines the
    whole tokenize+5-gram chain into the inferred ``size(g)>0 AND
    isnotnull(g)`` filter BELOW the projections — recomputing the chain
    three times per row (measured 13× slower at sf1: 41 s vs 3 s for the
    identical result). A non-attribute generator child keeps the chain
    evaluated exactly once.
    """
    d = load_table(spark, sf_dir, "documents")
    w = space_tokens("text")
    doc_grams = d.select("doc_id", w.alias("w")).select(
        "doc_id",
        F.when(
            F.size("w") >= 5,
            F.expr(
                "transform(sequence(1, size(w) - 4), i ->"
                " array_join(slice(w, i, 5), ' '))"
            ),
        ).otherwise(F.array().cast("array<string>")).alias("g"),
    )
    bench = (
        doc_grams.filter(F.col("doc_id") % 10 == 7)
        .select(F.explode(F.array_distinct("g")).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        doc_grams.filter(F.col("doc_id") % 10 != 7)
        .select("doc_id", F.explode(F.array_distinct("g")).alias("gram"))
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_ppm",
            F.expr("(n_contaminated * 1000000) div n_grams"),
        )
        .orderBy(F.desc("contamination_ppm"), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------- E5+: inverted index
@query(
    "inverted_index",
    oracle="""
    WITH dg AS (
      SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS word
        FROM documents) t
      WHERE word <> '')
    SELECT word, COUNT(*) AS df,
           ARRAY_TO_STRING(LIST_SLICE(LIST(doc_id ORDER BY doc_id), 1, 10), ',') AS postings
    FROM dg GROUP BY word ORDER BY df DESC, word LIMIT 50
    """,
)
def inverted_index(spark, sf_dir):
    """Inverted-index construction: word → document frequency + the first
    10 doc ids of its posting list (the retrieval-side data structure of a
    search/RAG pipeline). Per-group state is BOUNDED: a row_number window
    ranks each word's postings by doc_id and only ranks <= 10 enter the
    collect_list, so a stopword appearing in every document costs 10
    entries of aggregation state, not a corpus-sized array. The
    (doc, word) dedup is a per-row ``array_distinct`` — a document's
    words live in one row, so deduping them needs no exchange (the
    earlier corpus-wide ``.distinct()`` shuffled every pair once just to
    do per-doc dedup). That leaves ONE shuffle total: the window's hash
    partitioning on ``word``, which the groupBy then reuses.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    dg = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                space_tokens("text")
            )
        ).alias("word"),
    )
    w = Window.partitionBy("word").orderBy("doc_id")
    return (
        dg.withColumn("rn", F.row_number().over(w))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # serialized (comma-joined) postings: array-typed output columns
            # crash the driver's pandas canonicalizer (round-1 finding), so
            # the posting list leaves the engine as a STRING on both sides
            F.array_join(
                F.sort_array(
                    F.collect_list(F.when(F.col("rn") <= 10, F.col("doc_id")))
                ).cast("array<string>"),
                ",",
            ).alias("postings"),
        )
        .orderBy(F.desc("df"), "word")
        .limit(50)
    )


# ---------------------------------------------------------------- E6+: domain mixture weights
@query(
    "source_mixture_weights",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '')) AS n_tok
      FROM documents),
    per_source AS (
      SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM toks GROUP BY source),
    q AS (
      SELECT source, n_docs, n_tokens,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS qs
      FROM per_source)
    SELECT source, n_docs, n_tokens,
           CAST((qs * 1000000) // CAST(SUM(qs) OVER () AS BIGINT) AS BIGINT) AS weight_ppm
    FROM q ORDER BY source
    """,
)
def source_mixture_weights(spark, sf_dir):
    """Training-mixture weighting: per-source sampling weights with
    sqrt-damping (small domains up-weighted relative to raw token share —
    the standard mixture heuristic), in integer ppm. sqrt over a bigint
    token count is IEEE-correctly-rounded in both engines, and the weight
    normalization divides integer-quantized scores (floor again), so the
    result is bit-stable — no order-dependent float summation anywhere.

    Scale: token counting is a narrow map (array length, no explode);
    one shuffle to the per-source rollup. The normalizer is a SCALAR
    aggregate joined back as a 1-row broadcast — round 8 replaced the
    previous SUM() OVER () global window, whose single unbounded
    partition serialized the whole rollup through one task once the
    high-cardinality regime pushed #sources to 1.8 M (9.3 s vs
    DuckDB 2.5 s; the "post-agg rows are trivially small" assumption
    only held for tens of sources).
    """
    d = load_table(spark, sf_dir, "documents")
    w = space_tokens("text", lower=False)  # size-only consumer: count is case-invariant
    per_source = (
        d.select("source", F.size(w).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "qs",
            F.expr(
                "CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)"
            ),
        )
        # two consumers (normalizer + output) — tokenize the corpus once
        .localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    )
    den = per_source.agg(F.sum("qs").alias("den"))
    return (
        per_source.crossJoin(F.broadcast(den))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("(qs * 1000000) div den").alias("weight_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- E6+: dataset split assignment
@query(
    "dataset_split_assign",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '')) AS n_tok,
             CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10 < 8 THEN 'train'
                  WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           (COUNT(*) * 1000000) // (SELECT COUNT(*) FROM documents) AS share_ppm
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def dataset_split_assign(spark, sf_dir):
    """Deterministic train/val/test split assignment (80/10/10): each doc
    routes by a Knuth multiplicative hash of its id — pure int64
    arithmetic (``(id * 2654435761) mod 2^32 mod 10``), so the SAME doc
    lands in the SAME split on any engine, any partitioning, any rerun;
    no RNG state, no sampling drift between pipeline stages. Reported
    per split: doc/token counts and the realized share (ppm).

    Scale: assignment is a stateless row-local expression (fuses into the
    scan); the rollup shuffles 3 groups. The scalar total joins back as a
    1-row broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    w = space_tokens("text", lower=False)  # size-only consumer: count is case-invariant
    bucket = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % 10
    assigned = d.select(
        F.size(w).alias("n_tok"),
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias("split"),
    )
    total = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "split",
            "n_docs",
            "n_tokens",
            F.expr("(n_docs * 1000000) div total").alias("share_ppm"),
        )
        .orderBy("split")
    )


# ------------------------------------------------- E5: bigram LM surprisal
@query(
    "bigram_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '') AS w
      FROM documents),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
      FROM toks, UNNEST(RANGE(1, LEN(w))) AS t(i)),
    lm AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
    scored AS (
      SELECT bg.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(length(bin(lm.c))) AS BIGINT) AS familiarity_bits
      FROM bg JOIN lm ON bg.bigram = lm.bigram
      GROUP BY bg.doc_id)
    SELECT doc_id, n_bigrams,
           (familiarity_bits * 1000000) // n_bigrams AS familiarity_ppm
    FROM scored ORDER BY familiarity_ppm ASC, doc_id LIMIT 100
    """,
)
def bigram_surprisal(spark, sf_dir):
    """Language-model quality proxy without a language model: score each
    document by the average corpus familiarity of its word bigrams, where
    familiarity(bigram) = bit_length(corpus count) — an integer stand-in
    for log2(freq) that both engines compute identically via
    length(bin(n)) (no libm). Low scores = documents made of rare
    transitions (OOD / noisy text) — the cheap first-pass perplexity
    filter of a curation pipeline. Shape at 100 TB: one explode + one
    (bigram) count shuffle + one broadcast-size LM join back; the avg is
    a portable integer floor division in ppm."""
    d = load_table(spark, sf_dir, "documents")
    w = space_tokens("text")
    bg = (
        d.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("w") >= 2,
                    F.expr(
                        "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram"),
        )
    )
    lm = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        bg.join(lm, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.length(F.bin("c"))).cast("bigint").alias("familiarity_bits"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "n_bigrams",
            F.expr(
                "(familiarity_bits * 1000000) DIV n_bigrams"
            ).alias("familiarity_ppm"),
        )
        .orderBy("familiarity_ppm", "doc_id")
        .limit(100)
    )


# ------------------------------------------- E5: language-ID evaluation
@query(
    "lang_id_confusion",
    oracle=f"""
    WITH preds AS ({_LANG_ID_SQL})
    SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
           CAST((COUNT(*) * 1000000)
             // CAST(SUM(COUNT(*)) OVER (PARTITION BY lang_true) AS BIGINT)
             AS BIGINT) AS row_share_ppm
    FROM preds GROUP BY lang_true, lang_pred
    ORDER BY lang_true, lang_pred
    """,
)
def lang_id_confusion(spark, sf_dir):
    """Classifier evaluation as a dataflow: the confusion matrix of the
    stopword language-ID against the corpus's true labels, with per-row
    shares in integer ppm (portable floor division over a windowed
    total). The eval-harness pattern every model-adjacent pipeline needs
    — predictions and labels never leave the engine."""
    d = load_table(spark, sf_dir, "documents")
    preds = d.select(
        F.col("lang").alias("lang_true"),
        T.detect_language(F.col("text")).alias("lang_pred"),
    )
    counts = preds.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang_true")
    return (
        counts.select(
            "lang_true",
            "lang_pred",
            "n",
            F.expr("n * 1000000").alias("_num"),
            F.sum("n").over(w).alias("_tot"),
        )
        .select(
            "lang_true",
            "lang_pred",
            "n",
            F.expr("_num DIV _tot").alias("row_share_ppm"),
        )
        .orderBy("lang_true", "lang_pred")
    )


# ------------------------------------------- training-batch assembly ops
@query(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                  AS BIGINT) AS n_tok
      FROM documents),
    offs AS (
      SELECT doc_id, lang, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM toks)
    SELECT lang, CAST(off // 2048 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM offs GROUP BY lang, off // 2048
    ORDER BY lang, bin LIMIT 500
    """,
)
def sequence_packing(spark, sf_dir):
    """Training-sequence packing manifest: docs are packed into
    2048-token bins per language in deterministic doc_id order — a doc
    belongs to the bin its cumulative token offset starts in (the
    order-preserving concat-then-split packing used when document order
    must be reproducible; a bin overflows by at most one document's
    tail). The manifest (docs, tokens, id range per bin) is what the
    loader reads to seek into the packed corpus.

    Scale design (round-8 rework; the token_budget_mixture decomposition
    llm.py:2359 applied to an order-preserving prefix scan): the naive
    plan windows the running sum over (lang) alone, so every language's
    docs — under source/language skew, most of the corpus — serialize
    through ONE task's sort. Instead doc_id space is cut into 64
    ORDER-PRESERVING range shards (shard = doc_id div W, monotone in
    doc_id, so concatenating shards in shard order reproduces the exact
    per-lang doc_id order); the corpus-wide window then partitions by
    (lang, shard) — 64× the parallelism — and each row's offset is
    shard_prefix + in-shard running sum, identical to the single window
    by associativity of the prefix sum. The shard prefixes come from a
    ≤64-rows-per-lang rollup window, and the tokenize pass runs ONCE
    (checkpointed narrow frame feeds both the rollup and the big
    window). max(doc_id) is a bounded scalar probe off the same frame."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(space_tokens("text", lower=False)).cast(
            "bigint"
        ).alias("n_tok"),
    ).localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    max_id = toks.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        return toks.select(
            "lang",
            F.lit(0).cast("bigint").alias("bin"),
            F.lit(0).cast("bigint").alias("n_docs"),
            F.lit(0).cast("bigint").alias("n_tokens"),
            F.lit(0).cast("bigint").alias("first_doc"),
            F.lit(0).cast("bigint").alias("last_doc"),
        ).limit(0)
    width = max(1, (int(max_id) + 64) // 64)
    sh = toks.withColumn("shard", F.expr(f"doc_id div {width}"))
    pre = sh.groupBy("lang", "shard").agg(F.sum("n_tok").alias("st")).select(
        F.col("lang").alias("p_lang"),
        F.col("shard").alias("p_shard"),
        F.coalesce(
            F.sum("st").over(
                Window.partitionBy("lang")
                .orderBy("shard")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("spre"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        sh.withColumn("ioff", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .join(
            F.broadcast(pre),
            F.col("lang").eqNullSafe(F.col("p_lang"))
            & (F.col("shard") == F.col("p_shard")),
        )
        .withColumn("off", F.col("spre") + F.col("ioff"))
    )
    return (
        offs.withColumn("bin", F.expr("off DIV 2048"))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("lang", "bin")
        .limit(500)
    )


@query(
    "shard_manifest",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               AS h,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                  AS BIGINT) AS n_tok
      FROM documents),
    sh AS (
      SELECT doc_id, n_tok, h % 16 AS shard,
             ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY h % 16) AS n
      FROM toks)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS head_doc,
           CAST(MAX(CASE WHEN rn = n THEN doc_id END) AS BIGINT) AS tail_doc
    FROM sh GROUP BY shard ORDER BY shard
    """,
)
def shard_manifest(spark, sf_dir):
    """Deterministic global shuffle for training: every doc is routed to
    one of 16 output shards by the portable hash of its id and ORDERED
    within the shard by (hash, id) — a seeded pseudo-random permutation
    that is identical on any engine, any partitioning, any run (no
    ``rand()``, whose draw order is partition-dependent). The manifest
    reports per-shard doc/token totals plus the first and last doc under
    the shuffle order, pinning the permutation's endpoints. At 100 TB
    this is one hash-partitioned shuffle + per-shard sort — exactly the
    write path of a `repartitionByRange`-style shard job."""
    from delta_unity_duckdb_spark.functions.hashing import hash60

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        hash60(F.col("doc_id").cast("string")).alias("h"),
        F.size(space_tokens("text", lower=False)).cast(
            "bigint"
        ).alias("n_tok"),
    ).withColumn("shard", F.pmod("h", F.lit(16)))
    ws = Window.partitionBy("shard").orderBy("h", "doc_id")
    sh = toks.select(
        "doc_id",
        "n_tok",
        "shard",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("shard")).alias("n"),
    )
    return (
        sh.groupBy("shard")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("head_doc"),
            F.max(F.when(F.col("rn") == F.col("n"), F.col("doc_id")))
            .cast("bigint")
            .alias("tail_doc"),
        )
        .withColumn("shard", F.col("shard").cast("bigint"))
        .orderBy("shard")
    )


@query(
    "dedup_signal_agreement",
    oracle=f"""
    WITH docs AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN embeddings e ON d.doc_id = e.vec_id),
    tp AS ({D.minhash_pairs_sql('docs', 'doc_id', 'text', num_perm=32, bands=8)}),
    sp AS (
      SELECT id_a, id_b
      FROM ({S.cosine_pairs_lsh_sql(dim=64, threshold=0.35, num_planes=24, bands=6)})),
    uni AS (
      SELECT COALESCE(t.id_a, s.id_a) AS id_a,
             t.id_a IS NOT NULL AS in_text,
             s.id_a IS NOT NULL AS in_sem
      FROM tp t FULL OUTER JOIN sp s
        ON t.id_a = s.id_a AND t.id_b = s.id_b)
    SELECT CAST(SUM(CASE WHEN in_text AND in_sem THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both,
           CAST(SUM(CASE WHEN in_text AND NOT in_sem THEN 1 ELSE 0 END) AS BIGINT)
             AS n_text_only,
           CAST(SUM(CASE WHEN in_sem AND NOT in_text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_semantic_only,
           CAST((SUM(CASE WHEN in_text AND in_sem THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS agreement_ppm
    FROM uni
    """,
)
def dedup_signal_agreement(spark, sf_dir):
    """Cross-signal dedup evaluation — the health check a curation
    pipeline runs on its OWN detectors: do the lexical near-dup signal
    (MinHash+LSH over text) and the semantic signal (random-hyperplane
    cosine LSH over embeddings) flag the same pairs? Both candidate
    generators are the proven banded equi-joins (never all-pairs); the
    two pair sets FULL-OUTER-join on (id_a, id_b) and the agreement
    lands as integer ppm. A collapsing agreement rate in production
    means one detector drifted (tokenizer change, embedding model swap)
    — this query is the monitor. Restricted to docs that have an
    embedding so both signals see the same universe. (On the synthetic
    fixtures the embeddings are random vectors uncorrelated with the
    text, so the expected agreement is ~0 — the monitor correctly
    reports that the two detectors fire on disjoint pairs; both margins
    are non-zero, so the check is non-vacuous.)"""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    docs = d.join(e.select(F.col("vec_id").alias("doc_id")), "doc_id").select(
        "doc_id", "text"
    )
    tp = D.minhash_near_dups(docs, "doc_id", "text", num_perm=32, bands=8).select(
        "id_a", "id_b", F.lit(True).alias("in_text")
    )
    sp = S.cosine_pairs_lsh(e, threshold=0.35, num_planes=24, bands=6).select(
        "id_a", "id_b", F.lit(True).alias("in_sem")
    )
    uni = tp.join(sp, ["id_a", "id_b"], "full").select(
        F.coalesce("in_text", F.lit(False)).alias("in_text"),
        F.coalesce("in_sem", F.lit(False)).alias("in_sem"),
    )
    both = F.sum(F.when(F.col("in_text") & F.col("in_sem"), 1).otherwise(0))
    return uni.agg(
        both.cast("bigint").alias("n_both"),
        F.sum(F.when(F.col("in_text") & ~F.col("in_sem"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_text_only"),
        F.sum(F.when(F.col("in_sem") & ~F.col("in_text"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_semantic_only"),
        F.expr(
            "CAST((SUM(CASE WHEN in_text AND in_sem THEN 1 ELSE 0 END) * 1000000)"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("agreement_ppm"),
    )


@query(
    "boilerplate_ngram_flags",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0
               THEN ' terms of service apply all rights reserved contact support'
               ELSE '' END AS text
      FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               range(1, len(words) - 1),
               i -> array_to_string(list_slice(words, i, i + 2), ' ')))) AS g
      FROM (SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+') AS words
            FROM dirty)),
    hs AS (SELECT doc_id, {hash60_sql('g')} AS h FROM sh),
    df AS (
      SELECT h, COUNT(*) AS n_docs FROM hs GROUP BY h),
    total AS (SELECT COUNT(*) AS n FROM dirty),
    boiler AS (
      SELECT h FROM df, total WHERE n_docs * 100 >= n * 20),
    per_doc AS (
      SELECT s.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
      FROM hs s LEFT JOIN boiler b ON s.h = b.h
      GROUP BY s.doc_id)
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_boiler AS BIGINT) AS n_boiler,
           CAST((n_boiler * 1000000) // n_grams AS BIGINT) AS boiler_ppm,
           (n_boiler * 5) >= n_grams AS flagged
    FROM per_doc ORDER BY boiler_ppm DESC, doc_id LIMIT 300
    """,
)
def boilerplate_ngram_flags(spark, sf_dir):
    """Corpus-level boilerplate detection (the C4-style cleaning signal):
    a word trigram appearing in ≥20% of documents is boilerplate
    (navigation chrome, license footers — the fixture text is uniform
    word soup, so a deterministic dirty twin appends a shared legal
    footer to every 3rd doc, mirrored in the oracle exactly as
    pii_redact's injection is); each doc reports its distinct-trigram count, how many are
    boilerplate, the ratio in exact ppm, and a ≥20%-of-grams flag. Plan
    shape at 100 TB: one explode → document-frequency aggregate (the DF
    table is vocabulary-sized, NOT corpus-sized), broadcast-joined back
    over the exploded grams — two keyed shuffles total, no all-pairs
    anywhere. Thresholds are integer arithmetic (n_docs·100 ≥ N·20,
    ppm via DIV) so both engines agree exactly.

    Both shuffles key on the md5-portable 60-bit gram hash, not the gram
    string (mirrored in the oracle, as in exact_span_dedup — a collision
    pools the same grams in both engines), and the hashed explode is
    checkpointed so the corpus tokenizes ONCE for its two consumers — at
    sf100 (5M docs) the string-keyed double-tokenize form measured 370 s
    vs 41 s in the oracle engine."""
    from delta_unity_duckdb_spark.functions.hashing import hash60

    d = load_table(spark, sf_dir, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                " terms of service apply all rights reserved contact support",
            ).otherwise(""),
        ).alias("text"),
    )
    sh = (
        D.shingle_rows(dirty, "doc_id", "text", 3, distinct=True)
        .select(F.col("id").alias("doc_id"), hash60(F.col("s")).alias("gh"))
        .localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    )
    n_total = d.count()
    df_tab = sh.groupBy("gh").agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = df_tab.filter(F.col("n_docs") * 100 >= F.lit(n_total) * 20).select(
        "gh", F.lit(True).alias("is_boiler")
    )
    per_doc = (
        sh.join(F.broadcast(boiler), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("is_boiler"), 1).otherwise(0)
            ).alias("n_boiler"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_boiler").cast("bigint").alias("n_boiler"),
        F.expr("CAST((n_boiler * 1000000) DIV n_grams AS BIGINT)").alias(
            "boiler_ppm"
        ),
        (F.col("n_boiler") * 5 >= F.col("n_grams")).alias("flagged"),
    ).orderBy(F.desc("boiler_ppm"), "doc_id").limit(300)


@query(
    "quality_retention_sweep",
    oracle="""
    WITH t AS (
      SELECT doc_id, LENGTH(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks,
             LENGTH(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS punct
      FROM documents),
    scored AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
             CAST(FLOOR((LEAST(n_chars / 200.0, 1.0)
                    + (1.0 - LEAST(punct / GREATEST(n_chars, 1) * 5.0, 1.0))
                    + CASE WHEN len(toks) > 0
                           THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                           ELSE 0.0 END) / 3.0 * 10000) AS BIGINT) AS q_e4
      FROM t),
    sweep AS (
      SELECT s.*, th.threshold
      FROM scored s CROSS JOIN
           (SELECT UNNEST([5000, 6000, 6500, 7000, 7500, 8000]) AS threshold) th)
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(SUM(CASE WHEN q_e4 >= threshold THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_kept,
           CAST(SUM(CASE WHEN q_e4 >= threshold THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST((SUM(CASE WHEN q_e4 >= threshold THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS docs_ppm,
           CAST((SUM(CASE WHEN q_e4 >= threshold THEN n_tok ELSE 0 END) * 1000000)
                // SUM(n_tok) AS BIGINT) AS tokens_ppm
    FROM sweep GROUP BY threshold ORDER BY threshold
    """,
)
def quality_retention_sweep(spark, sf_dir):
    """Retention-at-threshold curve — the table read before fixing a
    quality cutoff: for each candidate threshold over the floor-quantized
    [0,1]·10⁴ quality score, how many documents and tokens survive
    (absolute + exact ppm of the corpus). Each doc is scored ONCE
    (narrow map); the six thresholds are LITERALS, so the whole curve is
    one global aggregate of 6×2 conditional sums unpivoted with
    ``stack`` — the corpus is never re-scanned (or row-replicated) per
    threshold. Round 9: the previous broadcast-cross-join ×6 + grouped
    aggregate cost ~1.0 s beyond the 0.35 s scoring pass at sf0.1 (row
    replication through the join and a 2-exchange grouped agg for sums
    a single scalar row already determines); same sums, same DIV ppm,
    2.4 s → ~0.5 s."""
    from delta_unity_duckdb_spark.operators.text import quality_score_raw, tokens

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        F.floor(quality_score_raw(F.col("text")) * 10000)
        .cast("bigint")
        .alias("q_e4"),
    )
    ths = (5000, 6000, 6500, 7000, 7500, 8000)
    aggs = [
        F.count(F.lit(1)).alias("_n_all"),
        F.sum("n_tok").alias("_tok_all"),
    ]
    for th in ths:
        kept = F.when(F.col("q_e4") >= th, 1).otherwise(0)
        kept_tok = F.when(F.col("q_e4") >= th, F.col("n_tok")).otherwise(0)
        aggs += [
            F.sum(kept).cast("bigint").alias(f"_d{th}"),
            F.sum(kept_tok).cast("bigint").alias(f"_t{th}"),
        ]
    one = scored.agg(*aggs)
    stacked = ", ".join(
        f"CAST({th} AS BIGINT), _d{th}, _t{th}" for th in ths
    )
    return (
        one.selectExpr(
            f"stack({len(ths)}, {stacked}) AS (threshold, docs_kept, tokens_kept)",
            "_n_all",
            "_tok_all",
        )
        # Degenerate-input identity: the cross-join/groupBy form emits 0
        # rows on an EMPTY corpus (no rows to replicate), while a global
        # aggregate always emits one row per threshold (NULL counts, NULL
        # DIV ppm). Keep the old contract exactly.
        .filter(F.col("_n_all") > 0)
        .select(
            "threshold",
            "docs_kept",
            "tokens_kept",
            F.expr("CAST((docs_kept * 1000000) DIV _n_all AS BIGINT)").alias(
                "docs_ppm"
            ),
            F.expr("CAST((tokens_kept * 1000000) DIV _tok_all AS BIGINT)").alias(
                "tokens_ppm"
            ),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------- E5: BPE vocab induction
from delta_unity_duckdb_spark.operators import bpe as B  # noqa: E402


@query("bpe_vocab_merges", oracle=B.bpe_merges_sql(iters=6, vocab_cap=50_000))
def bpe_vocab_merges(spark, sf_dir):
    """Tokenizer-training BPE merge table over the documents corpus
    (operators/bpe.py — word-frequency shuffle + capped-vocab merge
    rounds; oracle replays the identical iterations as unrolled CTEs)."""
    d = load_table(spark, sf_dir, "documents")
    return B.bpe_merge_table(d, "text", iters=6, vocab_cap=50_000)


@query(
    "bpe_encode_stats",
    oracle=B.bpe_encode_stats_sql(iters=6, vocab_cap=50_000),
)
def bpe_encode_stats(spark, sf_dir):
    """Train→apply tokenizer loop: corpus compression under the learned
    merges, computed from the final symbol state of the capped
    word-frequency table (no second corpus pass)."""
    d = load_table(spark, sf_dir, "documents")
    return B.bpe_encode_stats(d, "text", iters=6, vocab_cap=50_000)


# ---------------------------------------------------------------- winnowing
@query(
    "winnow_fingerprint_pairs",
    oracle=f"""
    WITH fps AS ({D.winnow_fps_sql('documents', 'doc_id', 'text', k=4, w=4)}),
    small AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING COUNT(*) BETWEEN 2 AND 1000),
    kept AS (SELECT f.id, f.fp FROM fps f JOIN small s ON f.fp = s.fp)
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared_fps
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
    GROUP BY a.id, b.id HAVING COUNT(*) >= 2
    ORDER BY shared_fps DESC, id_a, id_b LIMIT 200
    """,
)
def winnow_fingerprint_pairs(spark, sf_dir):
    """MOSS-winnowing near-dup pairs: docs ranked by how many selected
    k-gram fingerprints they share. Unlike MinHash (whole-doc similarity)
    winnowing guarantees any shared run of k+w-1 tokens surfaces at least
    one common fingerprint, so it catches *partial* overlap — a copied
    paragraph inside an otherwise-unrelated doc.

    Scale: fingerprints are ~2/(w+1) of the shingle volume; the pair
    join goes through a per-fingerprint bucket census (2..1000 docs) so
    corpus-wide boilerplate fingerprints are dropped before the join —
    same guard as the MinHash path (minhash_near_dups). No cross join.
    """
    d = load_table(spark, sf_dir, "documents")
    # the fingerprint frame feeds THREE consumers (census, both join
    # sides); localCheckpoint materializes it once instead of replaying
    # the shingle/hash/window pipeline per branch (same trick as the
    # curation capstone) — at cluster scale this is the persisted
    # fingerprint index
    fps = D.winnow_fingerprints(d, "doc_id", "text", k=4, w=4).localCheckpoint(
        storageLevel=CKPT_DESER
    )
    small = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= 1000))
        .select("fp")
    )
    kept = fps.join(small, "fp")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
        .orderBy(F.desc("shared_fps"), "id_a", "id_b")
        .limit(200)
    )


# ---------------------------------------------------------------- exact spans
@query(
    "exact_span_dedup",
    oracle=f"""
    WITH sh AS ({D.shingles_sql('documents', 'doc_id', 'text', 8)}),
    spans AS (
      SELECT id AS doc_id, UNNEST(shingles) AS s
      FROM sh WHERE len(shingles) > 0),
    hs AS (SELECT doc_id, {hash60_sql('s')} AS h FROM spans),
    marked AS (SELECT h FROM hs GROUP BY h HAVING COUNT(*) >= 2)
    SELECT hs.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN m.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_spans,
           ROUND(CAST(SUM(CASE WHEN m.h IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS dup_ratio
    FROM hs LEFT JOIN marked m ON hs.h = m.h
    GROUP BY hs.doc_id
    ORDER BY dup_ratio DESC, doc_id LIMIT 500
    """,
)
def exact_span_dedup(spark, sf_dir):
    """Exact-substring duplication ratio per document: the fraction of a
    doc's distinct 8-token spans that appear verbatim in at least one
    other place in the corpus (the span-level dedup signal of
    "Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022, at n-gram granularity). Curation rule downstream:
    drop or trim docs above a dup_ratio threshold.

    Scale: strictly linear — spans are hashed (md5-portable 60-bit) so
    the shuffle key is a fixed-width long, and the duplicated-span census
    is a COUNT window over h: every (doc, span) row learns its span's
    corpus frequency in the same exchange that the old census-groupBy +
    join-back needed TWO passes (and a localCheckpoint to avoid
    re-tokenizing) for. One consumer of the shingle explode → the corpus
    tokenizes once with no materialization barrier at all — round 6
    measured the per-iteration checkpoint re-write as the warm>cold
    inversion at sf100 (265.7 s warm vs 183.6 s cold). No pair join
    exists in this operator, so a boilerplate span shared by millions of
    docs costs its group count, never a blow-up; the worst window
    partition is that group's (doc_id, h) rows — 16 bytes each.
    """
    from pyspark.sql import Window

    from delta_unity_duckdb_spark.functions.hashing import hash60

    d = load_table(spark, sf_dir, "documents")
    spans = D.shingle_rows(d, "doc_id", "text", 8, distinct=True).select(
        F.col("id").alias("doc_id"), hash60(F.col("s")).alias("h")
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    return (
        spans.select("doc_id", (nd >= 2).cast("int").alias("dup"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("dup").cast("bigint").alias("dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            F.round(F.col("dup_spans").cast("double") / F.col("n_spans"), 4).alias(
                "dup_ratio"
            ),
        )
        .orderBy(F.desc("dup_ratio"), "doc_id")
        .limit(500)
    )


# ---------------------------------------------------------------- quantization
@query(
    "embedding_quantization",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xs
      FROM embeddings),
    s AS (
      SELECT vec_id, xs,
             list_max(list_transform(xs, v -> abs(v))) / 127.0 AS scale
      FROM x
      WHERE list_max(list_transform(xs, v -> abs(v))) > 0),
    q AS (
      SELECT vec_id, xs, scale,
             list_transform(xs,
               v -> least(greatest(floor(v / scale + 0.5), -127.0), 127.0)) AS qs
      FROM s)
    SELECT vec_id,
           ROUND(scale, 9) AS scale_r,
           ROUND(list_sum(list_transform(list_zip(xs, qs),
                   p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale)))
                 / len(xs), 9) AS mse,
           ROUND(list_sum(list_transform(list_zip(xs, qs), p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(xs, v -> v * v)))
                    * sqrt(list_sum(list_transform(qs, v -> v * v)))), 6)
             AS cos_fid
    FROM q ORDER BY vec_id LIMIT 2000
    """,
)
def embedding_quantization(spark, sf_dir):
    """Int8 symmetric scalar quantization of the embedding column — the
    standard 4x storage/bandwidth cut before ANN indexing at corpus
    scale — with per-vector fidelity metrics: reconstruction MSE and the
    cosine between the original and quantized vector (scale cancels, so
    cos_fid isolates pure rounding loss).

    Determinism: rounding is floor(x/scale + 0.5) — identical IEEE ops
    in both engines (no round-half-even vs half-up divergence) — and the
    element fold runs in list order on 64 elements, so the doubles agree
    to the last ulp before the final display ROUND.

    Scale: pure narrow map, zero shuffles before the output sort; at
    100 TB this runs as a projection fused into whatever scan feeds the
    index builder.
    """
    e = load_table(spark, sf_dir, "embeddings")
    xs = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    out = (
        e.select("vec_id", xs.alias("xs"))
        .withColumn(
            "amax", F.array_max(F.transform(F.col("xs"), F.abs))
        )
        .filter(F.col("amax") > 0)
        .withColumn("scale", F.col("amax") / 127.0)
        .withColumn(
            "qs",
            F.transform(
                F.col("xs"),
                lambda v: F.least(
                    F.greatest(
                        F.floor(v / F.col("scale") + 0.5).cast("double"),
                        F.lit(-127.0),
                    ),
                    F.lit(127.0),
                ),
            ),
        )
    )
    sq_err = F.aggregate(
        F.zip_with(
            F.col("xs"),
            F.col("qs"),
            lambda a, b: (a - b * F.col("scale")) * (a - b * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dot = F.aggregate(
        F.zip_with(F.col("xs"), F.col("qs"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    return (
        out.select(
            "vec_id",
            F.round(F.col("scale"), 9).alias("scale_r"),
            F.round(sq_err / F.size(F.col("xs")), 9).alias("mse"),
            F.round(dot / (norm(F.col("xs")) * norm(F.col("qs"))), 6).alias(
                "cos_fid"
            ),
        )
        .orderBy("vec_id")
        .limit(2000)
    )


# ---------------------------------------------------------------- dim stats
@query(
    "embedding_dim_stats",
    oracle="""
    WITH ex AS (
      SELECT UNNEST(range(len(embedding))) AS dim,
             UNNEST(list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)))
               AS fp
      FROM embeddings)
    SELECT dim, COUNT(*) AS n,
           ROUND(CAST(SUM(fp) AS DOUBLE) / COUNT(*) / 1000000, 8) AS mean_r,
           ROUND((CAST(SUM(fp * fp) AS DOUBLE) / COUNT(*)
                  - (CAST(SUM(fp) AS DOUBLE) / COUNT(*))
                    * (CAST(SUM(fp) AS DOUBLE) / COUNT(*)))
                 / 1000000000000, 8) AS var_r
    FROM ex GROUP BY dim ORDER BY dim
    """,
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension mean/variance of the embedding matrix — the health
    check before whitening/PCA/quantizer training (a dead or exploding
    dimension shows up here first).

    Determinism at any parallelism: float sums are order-dependent, so
    values are fixed-point-quantized to 1e-6 BIGINTs first and summed
    EXACTLY (Spark sums through DECIMAL(38,0) so a 100 TB corpus cannot
    overflow the accumulator; DuckDB sums BIGINT into HUGEINT); the
    integer totals convert to the same double on every engine and every
    partitioning. Same trick as kmeans_clusters (operators/clustering.py).

    Scale: posexplode is a narrow map; the aggregation has exactly
    `dim` groups with map-side partial aggregation, so the shuffle
    carries dim x n_partitions rows — nothing at corpus scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda v: F.floor(v.cast("double") * 1000000 + 0.5).cast("long"),
            )
        ).alias("dim", "fp")
    )
    agg = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("fp").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("fp") * F.col("fp")).cast("decimal(38,0)")).alias("s2"),
    )
    mean_fp = F.col("s1").cast("double") / F.col("n")
    return agg.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n",
        F.round(mean_fp / 1000000, 8).alias("mean_r"),
        F.round(
            (F.col("s2").cast("double") / F.col("n") - mean_fp * mean_fp)
            / 1000000000000,
            8,
        ).alias("var_r"),
    ).orderBy("dim")


# ---------------------------------------------------------------- outliers
@query(
    "embedding_centroid_outliers",
    oracle="""
    WITH ex AS (
      SELECT UNNEST(range(len(embedding))) AS dim,
             UNNEST(list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)))
               AS fp
      FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)),
    agg AS (
      SELECT dim, CAST(SUM(fp) AS DOUBLE) / COUNT(*) / 1000000 AS mu
      FROM ex GROUP BY dim),
    mus AS (SELECT list(mu ORDER BY dim) AS mu FROM agg)
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           ROUND(list_sum(list_transform(
             list_zip(list_transform(embedding, v -> CAST(v AS DOUBLE)), mu),
             p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS sq_dist
    FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL), mus
    ORDER BY sq_dist DESC, vec_id LIMIT 50
    """,
)
def embedding_centroid_outliers(spark, sf_dir):
    """Embedding-space outlier detection: squared L2 distance from the
    corpus centroid, top 50 — the cheap first-pass filter for
    corrupt/off-distribution vectors before they poison ANN recall or
    k-means initialization.

    Determinism: the centroid comes from EXACT fixed-point sums (same
    pattern as embedding_dim_stats), so it is identical at any
    partitioning; the per-vector distance folds the 64 elements in list
    order, matching the oracle's list_sum to the last ulp before the
    display ROUND.

    Scale: one dim-sized aggregation for the centroid, then a broadcast
    of the 64-double centroid into a narrow map + TakeOrdered(50) — two
    passes over the corpus, no self-join, no wide shuffle.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(
        # vector ops consider only rows WITH a vector (mirrored in the oracle)
        F.col("embedding").isNotNull()
    )
    ex = e.select(
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda v: F.floor(v.cast("double") * 1000000 + 0.5).cast("long"),
            )
        ).alias("dim", "fp")
    )
    mu_row = (
        ex.groupBy("dim")
        .agg(
            (
                F.sum(F.col("fp").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / 1000000
            ).alias("mu")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mu"))),
                lambda s: s.mu,
            ).alias("mu")
        )
    )
    xs = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    dist = F.aggregate(
        F.zip_with(xs, F.col("mu"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        e.crossJoin(F.broadcast(mu_row))
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.round(dist, 6).alias("sq_dist"),
        )
        .orderBy(F.desc("sq_dist"), "vec_id")
        .limit(50)
    )


# ---------------------------------------------------------------- PCA
from delta_unity_duckdb_spark.operators import pca as P  # noqa: E402


@query("pca_top_component", oracle=P.pca_power_sql("(SELECT * FROM embeddings WHERE embedding IS NOT NULL)", "embedding", iters=24))
def pca_top_component(spark, sf_dir):
    """Top principal component of the embedding corpus (operators/pca.py):
    Arrow-batched EXACT integer Gram partials via mapInPandas -> one
    dim^2-sized aggregation -> driver-side fixed-point power iteration.
    The oracle replays the identical iteration in HUGEINT CTEs, so the
    loadings hash-match bit-for-bit — a fully-verified distributed
    eigensolve."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        # vector ops consider only rows WITH a vector (mirrored in the oracle)
        F.col("embedding").isNotNull()
    )
    return P.pca_top_component(e, spark, "embedding", iters=24)


# ---------------------------------------------------------------- ANN recall
@query(
    "ann_recall_eval",
    oracle=f"""
    WITH exact AS (
      WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
      SELECT e.vec_id,
             ROUND(
               list_sum(list_transform(list_zip(e.embedding, q.qvec),
                                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * SQRT(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               4) AS cosine_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0
      ORDER BY cosine_sim DESC, e.vec_id LIMIT 10),
    approx AS ({S.ivf_topk_sql(k=10, nlist=16, nprobe=4)})
    SELECT CAST(10 AS BIGINT) AS k,
           (SELECT COUNT(*) FROM exact) AS n_exact,
           (SELECT COUNT(*) FROM approx) AS n_approx,
           (SELECT COUNT(*) FROM exact e JOIN approx a ON e.vec_id = a.vec_id)
             AS n_common,
           ROUND(CAST((SELECT COUNT(*) FROM exact e JOIN approx a
                       ON e.vec_id = a.vec_id) AS DOUBLE) / 10, 4) AS recall
    """,
)
def ann_recall_eval(spark, sf_dir):
    """ANN index-quality monitor: recall@10 of the IVF approximate search
    against the exact brute-force top-10 for the same query vector — the
    metric a production retrieval pipeline tracks to decide when nprobe
    (or the index) needs retuning. Both arms are the engine's own
    operators; the oracle replays both deterministic searches and the
    intersection, so even the EVALUATION is value-verified.

    Scale: exact arm is one broadcast-query scan + TakeOrdered(10); the
    IVF arm probes nprobe/nlist of the corpus; the intersection joins
    two 10-row frames. The monitor costs two searches, not an index
    rebuild.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    cand = e.filter(F.col("vec_id") != 0)
    exact = S.cosine_topk(cand, q, k=10).select("vec_id")
    approx = S.ivf_topk(cand, q, k=10, nlist=16, nprobe=4).select("vec_id")
    common = exact.join(approx, "vec_id")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(approx.agg(F.count(F.lit(1)).alias("n_approx")))
        .crossJoin(common.agg(F.count(F.lit(1)).alias("n_common")))
        .select(
            F.lit(10).cast("bigint").alias("k"),
            "n_exact",
            "n_approx",
            "n_common",
            F.round(F.col("n_common").cast("double") / 10, 4).alias("recall"),
        )
    )


@query(
    "pca_projection_scores",
    oracle=f"""
    WITH scored AS ({P.pca_projection_sql('(SELECT * FROM embeddings WHERE embedding IS NOT NULL)', 'embedding', 'vec_id', iters=24)})
    SELECT vec_id, score FROM scored
    ORDER BY ABS(score) DESC, vec_id LIMIT 100
    """,
)
def pca_projection_scores(spark, sf_dir):
    """PCA train->apply loop: fit the top component on the corpus, then
    rank vectors by |projection| — the diversity/outlier sampling signal
    a curation pipeline derives from its OWN fitted transform. Both the
    fit (fixed-point power iteration) and the apply (exact integer dot)
    are engine-exact, so the entire learned-transform application is
    value-verified."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        # vector ops consider only rows WITH a vector (mirrored in the oracle)
        F.col("embedding").isNotNull()
    )
    scores = P.pca_projection_scores(e, spark, "embedding", "vec_id", iters=24)
    return scores.orderBy(F.abs(F.col("score")).desc(), "vec_id").limit(100)


# --------------------------------------------- E2/E6+: leakage-safe split
from delta_unity_duckdb_spark.functions.hashing import hash60  # noqa: E402
from delta_unity_duckdb_spark.functions.frames import CKPT_DESER


@query(
    "leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE pairs AS ({D.minhash_pairs_sql(num_perm=32, bands=8)}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach AS (
      SELECT u AS node, u AS r FROM edges
      UNION
      SELECT e.v AS node, rr.r
      FROM reach rr JOIN edges e ON e.u = rr.node),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    lab AS (
      SELECT d.doc_id AS id, COALESCE(c.component, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
    sz AS (SELECT cluster, COUNT(*) AS csize FROM lab GROUP BY cluster),
    routed AS (
      SELECT l.id, l.cluster, s.csize,
             CASE WHEN ({hash60_sql("CAST(l.cluster AS VARCHAR)")}) % 10 < 8
                    THEN 'train'
                  WHEN ({hash60_sql("CAST(l.cluster AS VARCHAR)")}) % 10 = 8
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM lab l JOIN sz s ON s.cluster = l.cluster)
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT cluster) AS n_clusters,
           COUNT(CASE WHEN csize > 1 THEN 1 END) AS n_dup_docs
    FROM routed GROUP BY split ORDER BY split
    """,
)
def leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split: near-duplicate CLUSTERS route
    atomically — the split is a hash of the cluster label, so two
    near-identical documents can never land on opposite sides of the
    train/test boundary (the contamination mode a doc-level split like
    ``dataset_split_assign`` cannot rule out). Routing is the portable
    md5 hash of the cluster id (80/10/10), deterministic on any engine
    or partitioning; per split: docs, distinct clusters, and docs that
    belong to multi-member (actual-duplicate) families.

    The no-leakage invariant is structural — split = f(cluster) — and
    asserted in tests (no cluster id appears under two splits).

    Scale: cluster labels come from the same banded-MinHash + pointer-
    jumping components as ``near_dup_clusters`` (equi-join candidates,
    bucket census cap, no all-pairs); sizing + routing add one keyed
    count over cluster and a stateless row-local hash; the rollup
    shuffles 3 groups.
    """
    d = load_table(spark, sf_dir, "documents")
    clusters = D.near_dup_clusters(d, "doc_id", "text").select("id", "cluster")
    sized = clusters.select(
        "cluster",
        F.count(F.lit(1)).over(Window.partitionBy("cluster")).alias("csize"),
    )
    bucket = hash60(F.col("cluster").cast("string")) % 10
    routed = sized.select(
        "cluster",
        "csize",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        routed.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster").alias("n_clusters"),
            F.count(F.when(F.col("csize") > 1, 1)).alias("n_dup_docs"),
        )
        .orderBy("split")
    )


# ------------------------------------------- E6+: token-budget mixture fill
# Regime-ladder threshold: below this mean docs-per-source the plain
# per-source prefix window is already parallel (partitions = sources) and
# the boundary-shard machinery degenerates (see token_budget_mixture).
# Module-level so tests can pin BOTH plan shapes by injection.
_TB_SHARD_MIN_DOCS_PER_SOURCE = 256
@query(
    "token_budget_mixture",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '')) AS n_tok,
             {hash60_sql("'tb:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents WHERE text IS NOT NULL),
    per_source AS (
      SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens
      FROM toks GROUP BY source),
    q AS (
      SELECT source, src_tokens,
             CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS qs
      FROM per_source),
    b AS (
      SELECT source, src_tokens,
             CAST((qs * 1000000) // CAST(SUM(qs) OVER () AS BIGINT) AS BIGINT) AS w_ppm,
             CAST((SUM(src_tokens) OVER () * 2) // 5 AS BIGINT) AS b40
      FROM q),
    budgets AS (
      SELECT source, src_tokens, w_ppm,
             (b40 // 1000000) * w_ppm
               + ((b40 % 1000000) * w_ppm) // 1000000 AS budget_tokens
      FROM b),
    ordered AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source
                              ORDER BY h % 64, h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM toks),
    sel AS (
      SELECT o.source, COUNT(*) AS n_docs_sel,
             CAST(SUM(o.n_tok) AS BIGINT) AS tokens_sel
      FROM ordered o JOIN budgets bu ON bu.source = o.source
      WHERE o.running <= bu.budget_tokens
      GROUP BY o.source)
    SELECT bu.source, bu.src_tokens, bu.budget_tokens,
           COALESCE(s.n_docs_sel, 0) AS n_docs_sel,
           COALESCE(s.tokens_sel, 0) AS tokens_sel,
           CAST((COALESCE(s.tokens_sel, 0) * 1000000)
                // GREATEST(bu.budget_tokens, 1) AS BIGINT) AS fill_ppm
    FROM budgets bu LEFT JOIN sel s ON s.source = bu.source
    ORDER BY bu.source
    """,
)
def token_budget_mixture(spark, sf_dir):
    """Token-budget mixture fill — the data-selection step between
    mixture design and shard writing: a 40%-of-corpus token budget is
    allocated across sources by the sqrt-damped weights of
    ``source_mixture_weights``, then each source is filled in a
    deterministic pseudo-random order (portable md5 hash of the doc id)
    until its budget is exhausted. Small sources may fill completely
    (fill_ppm < 1e6 with all docs taken) — exactly the "epoch the small
    domains" behavior mixture training expects.

    Integer exactness at scale: ``budget = floor(b40 * w_ppm / 1e6)`` is
    computed as ``(b40 div 1e6)*w_ppm + ((b40 mod 1e6)*w_ppm) div 1e6``
    — algebraically identical, but every intermediate stays under 2^63
    even at 100 TB corpus sizes where the naive product overflows.

    Scale design: the per-source prefix scan is SHARDED — docs order by
    ``(h mod 64, h, doc_id)``, so Spark computes 64 parallel in-shard
    running sums plus a 64-row per-source shard rollup, never one
    serialized window over a whole (possibly 30%-of-corpus) source; the
    oracle's single window over the same total order is value-identical
    by associativity of the prefix sum.

    Tokenize-once: the narrow (source, doc_id, n_tok, h, shard) frame is
    checkpointed for its two consumers (shard rollup + running sum), and
    the per-source totals REUSE the 64-row-per-source shard subtotals
    (sum of sums — exact) instead of re-aggregating the corpus. The
    round-6 shape re-tokenized the 5 M-doc corpus three times — measured
    3.06x vs DuckDB at sf100 in a clean window, dominated by the
    repeated split+md5 passes.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = space_tokens("text", lower=False)  # size-only consumer: count is case-invariant
    toks = d.select(
        "source",
        "doc_id",
        F.size(w).alias("n_tok"),
        hash60(
            F.concat(F.lit("tb:"), F.col("doc_id").cast("string"))
        ).alias("h"),
    ).withColumn("shard", F.col("h") % 64).localCheckpoint(eager=False, storageLevel=CKPT_DESER)

    # Regime ladder (round 8, found by the 1.8M-distinct-source sweep):
    # the boundary-shard decomposition below assumes FEW, HUGE sources —
    # there, one source's prefix scan would serialize and the 64-way
    # shard split is the parallelism. With MANY tiny sources (mean docs/
    # source under the shard count) the machinery inverts: shard
    # subtotals approach row cardinality, every source straddles its
    # budget in its first shard, and the "tiny" boundary frame is a
    # corpus-sized join — while the plain per-source running-sum window
    # is already embarrassingly parallel (1.8M independent partitions).
    # One scan-only probe picks the plan; both are value-identical.
    # The probe reads `d`, NOT `toks`: it needs only the doc count and
    # source cardinality, so going to the raw table prunes the scan to
    # the `source` column (dictionary-coded, ~ms) instead of forcing the
    # tokenize+checkpoint to materialize before the plan is even chosen.
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("source").alias("s"),
    ).collect()[0]
    many_tiny = stats["n"] < stats["s"] * _TB_SHARD_MIN_DOCS_PER_SOURCE
    if many_tiny:
        per_source = (
            toks.groupBy("source")
            .agg(F.sum("n_tok").cast("bigint").alias("src_tokens"))
            .withColumn(
                "qs",
                F.expr(
                    "CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000000)"
                    " AS BIGINT)"
                ),
            )
        )
    else:
        shard_tot = toks.groupBy("source", "shard").agg(
            F.sum("n_tok").alias("st"), F.count(F.lit(1)).alias("nd")
        ).localCheckpoint(eager=False, storageLevel=CKPT_DESER)
        per_source = (
            shard_tot.groupBy("source")
            .agg(F.sum("st").cast("bigint").alias("src_tokens"))
            .withColumn(
                "qs",
                F.expr(
                    "CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000000)"
                    " AS BIGINT)"
                ),
            )
        )
    # Global normalizers as a SCALAR aggregate + 1-row broadcast — the
    # previous SUM() OVER () unbounded window serialized every per-source
    # row through one task once the high-cardinality regime pushed
    # #sources to 1.8M (the round-8 sweep's repeated finding: "tiny
    # post-agg frame" assumptions break when the key is the cardinality).
    totals = per_source.agg(
        F.sum("qs").alias("den"),
        (F.sum("src_tokens") * 2).alias("tot2"),
    )
    budgets = (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "src_tokens",
            F.expr("(qs * 1000000) div den").alias("w_ppm"),
            F.expr("tot2 div 5").alias("b40"),
        )
        .select(
            "source",
            "src_tokens",
            F.expr(
                "(b40 div 1000000) * w_ppm"
                " + ((b40 % 1000000) * w_ppm) div 1000000"
            ).alias("budget_tokens"),
        )
    )

    if many_tiny:
        # Plain per-source prefix scan: 1.8M independent window
        # partitions, one corpus shuffle. The selection order must be
        # IDENTICAL to the sharded plan's concatenation order — shards
        # ascending, then (h, doc_id) within a shard — or the two
        # regimes pick different boundary docs.
        run_w = (
            Window.partitionBy("source")
            .orderBy("shard", "h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sel = (
            toks.join(budgets.select("source", "budget_tokens"), "source")
            .select(
                "source",
                "n_tok",
                F.sum("n_tok").over(run_w).alias("running"),
                "budget_tokens",
            )
            .filter(F.col("running") <= F.col("budget_tokens"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs_sel"),
                F.sum("n_tok").cast("bigint").alias("tokens_sel"),
            )
        )
    else:
        # Boundary-shard selection: with cumulative shard subtotals in
        # hand, a shard is WHOLLY selected when cum_before + st <=
        # budget, wholly rejected when cum_before >= budget, and exactly
        # one shard per source straddles the budget boundary. Only that
        # boundary shard (~1/64 of one source) needs a per-row prefix
        # scan — the round-6 shape ran the in-shard running-sum window
        # over the ENTIRE corpus and filtered afterwards, a full
        # shuffle+sort of every doc row that at 100 TB is the plan's
        # biggest exchange for rows whose verdict the 64-row rollup
        # already decides. No forced broadcasts: AQE sees runtime sizes
        # (a few KB here; ~40 MB in the high-cardinality regime) and
        # picks broadcast vs shuffle itself.
        shard_state = shard_tot.join(
            budgets.select("source", "budget_tokens"), "source"
        ).select(
            "source",
            "shard",
            "st",
            "nd",
            "budget_tokens",
            F.coalesce(
                F.sum("st").over(
                    Window.partitionBy("source")
                    .orderBy("shard")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("cum_before"),
        )
        full = (
            shard_state.filter(
                F.col("cum_before") + F.col("st") <= F.col("budget_tokens")
            )
            .groupBy("source")
            .agg(
                F.sum("nd").alias("n_docs_sel"),
                F.sum("st").alias("tokens_sel"),
            )
        )
        boundary = shard_state.filter(
            (F.col("cum_before") < F.col("budget_tokens"))
            & (F.col("cum_before") + F.col("st") > F.col("budget_tokens"))
        ).select("source", "shard", "cum_before", "budget_tokens")
        in_shard = Window.partitionBy("source", "shard").orderBy(
            "h", "doc_id"
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bsel = (
            toks.join(boundary, ["source", "shard"])
            .select(
                "source",
                "n_tok",
                (
                    F.col("cum_before") + F.sum("n_tok").over(in_shard)
                ).alias("running"),
                "budget_tokens",
            )
            .filter(F.col("running") <= F.col("budget_tokens"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs_sel"),
                F.sum("n_tok").alias("tokens_sel"),
            )
        )
        sel = (
            full.unionAll(bsel)
            .groupBy("source")
            .agg(
                F.sum("n_docs_sel").cast("bigint").alias("n_docs_sel"),
                F.sum("tokens_sel").cast("bigint").alias("tokens_sel"),
            )
        )
    return (
        budgets.join(sel, "source", "left")
        .select(
            "source",
            "src_tokens",
            "budget_tokens",
            F.coalesce("n_docs_sel", F.lit(0)).alias("n_docs_sel"),
            F.coalesce("tokens_sel", F.lit(0)).alias("tokens_sel"),
            F.expr(
                "(COALESCE(tokens_sel, 0) * 1000000)"
                " div GREATEST(budget_tokens, 1)"
            ).alias("fill_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------------- E5+: context-length sweep
@query(
    "context_length_sweep",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                  * (1 + doc_id % 100) AS BIGINT) AS n_tok
      FROM documents WHERE text IS NOT NULL),
    ctxs AS (SELECT UNNEST([512, 1024, 2048, 4096]) AS ctx),
    sweep AS (
      SELECT c.ctx,
             COUNT(*) AS n_docs,
             COUNT(CASE WHEN t.n_tok > c.ctx THEN 1 END) AS docs_truncated,
             CAST(SUM(t.n_tok) AS BIGINT) AS tokens_total,
             CAST(SUM(GREATEST(t.n_tok - c.ctx, 0)) AS BIGINT) AS tokens_lost,
             CAST(SUM(LEAST(t.n_tok, c.ctx)) AS BIGINT) AS tokens_kept
      FROM toks t CROSS JOIN ctxs c
      GROUP BY c.ctx)
    SELECT ctx, n_docs, docs_truncated, tokens_total, tokens_lost,
           CAST((tokens_lost * 1000000) // GREATEST(tokens_total, 1)
                AS BIGINT) AS loss_ppm,
           CAST((tokens_kept + ctx - 1) // ctx AS BIGINT) AS n_sequences
    FROM sweep ORDER BY ctx
    """,
)
def context_length_sweep(spark, sf_dir):
    """Context-length decision sweep: for each candidate training context
    (512..4096), how many documents get truncated, what fraction of the
    corpus' tokens the truncation discards (ppm), and how many packed
    sequences the surviving stream fills (concat-then-split packing, so
    intra-bin padding is zero and sequence count is just
    ceil(kept/ctx)). This is the table a pipeline reads to pick its
    context length — the truncation-loss/compute trade made before
    ``sequence_packing`` lays out the chosen one. The fixture corpus is
    uniformly short (~54 tokens), which would make every candidate
    vacuously lossless, so a deterministic per-doc length spread
    (``n_tok * (1 + doc_id mod 100)``, the dirty-twin pattern of
    ``pii_redact``/``markup_text_extract``, identical in the oracle)
    restores the long-tail regime the sweep exists to discriminate.

    Scale: token counting is one narrow corpus pass; the 4-row context
    table cross-joins by BROADCAST (4x row multiplication collapses
    map-side into the partial aggregate — the sweep never shuffles more
    than 4 groups). Same single-pass-multi-threshold shape as
    ``quality_retention_sweep``."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = d.select(
        (
            F.size(space_tokens("text", lower=False))
            * (1 + F.col("doc_id") % 100)
        )
        .cast("bigint")
        .alias("n_tok")
    )
    from delta_unity_duckdb_spark.functions.frames import local_rows_df

    ctxs = local_rows_df(
        spark, [(512,), (1024,), (2048,), (4096,)], "ctx bigint"
    )
    sweep = (
        toks.crossJoin(F.broadcast(ctxs))
        .groupBy("ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("n_tok") > F.col("ctx"), 1)).alias(
                "docs_truncated"
            ),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
            F.sum(F.greatest(F.col("n_tok") - F.col("ctx"), F.lit(0)))
            .cast("bigint")
            .alias("tokens_lost"),
            F.sum(F.least(F.col("n_tok"), F.col("ctx")))
            .cast("bigint")
            .alias("tokens_kept"),
        )
    )
    return sweep.select(
        "ctx",
        "n_docs",
        "docs_truncated",
        "tokens_total",
        "tokens_lost",
        F.expr(
            "(tokens_lost * 1000000) div GREATEST(tokens_total, 1)"
        ).alias("loss_ppm"),
        F.expr("(tokens_kept + ctx - 1) div ctx").alias("n_sequences"),
    ).orderBy("ctx")
