"""Retrieval + batch-assembly workload: BM25 ranking over the corpus and
the deterministic training-order shuffle that feeds packed shards.

These extend the reference's text surface (delta-unity-duckdb exposes
keyword scans over document tables; SURVEY.md §2-E) with the two moves a
training-data pipeline runs between curation and the data loader:
score/select documents against a term query (BM25 — Robertson et al.,
the standard sparse-retrieval baseline) and lay the surviving corpus out
in a reproducible shuffled order, sharded so no single machine ever
holds the global permutation.

All arithmetic is engine-exact: BM25's k1/b constants are rationals
folded into one integer fraction, the idf is a log-free rational
surrogate, and the shuffle key is the portable md5-derived hash — so
both queries carry full value-level DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.functions.hashing import hash60, hash60_sql
from delta_unity_duckdb_spark.operators.similarity import cosine_sim
from delta_unity_duckdb_spark.operators.text import space_tokens
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query
from delta_unity_duckdb_spark.functions.frames import CKPT_DESER

# Query terms span the corpus' df spectrum (one rare term, two common)
# so the idf weighting is actually exercised, not a constant factor.
_BM25_TERMS = ("dup", "spark", "merge")

# k1 = 1.2, b = 0.75 (the standard BM25 operating point) folded into an
# exact integer fraction. With sdl = SUM(dl) over the corpus and n = doc
# count, the per-term saturation tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# becomes, after clearing denominators (avgdl = sdl/n, k1 = 6/5, b = 3/4)
# and dividing through by the common factor 2:
#
#     22*tf*sdl / (10*tf*sdl + 3*sdl + 9*dl*n)
#
# — a ratio of int64s, identical in both engines, no float in sight.
_FRAC_NUM = 22
_FRAC_D_TF = 10
_FRAC_D_SDL = 3
_FRAC_D_DLN = 9


def _score_sql(t: str, div: str) -> str:
    """The per-term BM25 score contribution as SQL text, parameterized by
    the integer-division token (Spark ``div``, DuckDB ``//``) so the two
    engines replay the IDENTICAL arithmetic from one source of truth.

    Overflow discipline — every int64 intermediate is kept under 2^63 at
    corpus scale by staged exact division instead of naive widening:

    - ``frac_micro = floor(a*1e6 / d)`` (a = 22*tf*sdl, d = the cleared
      denominator) is computed as three staged *1000 long-division steps:
      ``(a div d)*1e6 + ((a%d)*1000 div d)*1000 + (((a%d)*1000 % d)*1000)
      div d`` — algebraically identical, but the largest intermediate is
      ``d*1000`` instead of ``a*1e6``. The naive form overflows once
      tf*sdl > ~2.1e11 (a few-GB corpus with common terms); the staged
      form is exact to tf*sdl < ~9e14 and a itself to tf*sdl < 4.2e17.
    - ``(idf * frac) div 1e6`` is split as ``(idf div 1e6)*frac +
      ((idf % 1e6)*frac) div 1e6`` — exact, and safe for corpora to
      n < ~2e12 docs where the naive product overflows near n > 2.1e6
      with rare terms (idf ~ 2n*1e6).

    Spark (non-ANSI) wraps int64 silently while DuckDB raises, so the
    naive forms would break the engine-exactness contract silently on one
    side and loudly on the other — the staged forms keep both exact.
    """
    idf = f"((2 * (n - df_{t}) + 1) * 1000000) {div} (2 * df_{t} + 1)"
    a = f"({_FRAC_NUM} * tf_{t} * sdl)"
    d = (
        f"({_FRAC_D_TF} * tf_{t} * sdl + {_FRAC_D_SDL} * sdl + "
        f"{_FRAC_D_DLN} * dl * n)"
    )
    r1 = f"(({a} % {d}) * 1000)"
    frac = (
        f"(({a} {div} {d}) * 1000000 + ({r1} {div} {d}) * 1000 + "
        f"(({r1} % {d}) * 1000) {div} {d})"
    )
    return (
        f"((({idf}) {div} 1000000) * {frac} + "
        f"((({idf}) % 1000000) * {frac}) {div} 1000000)"
    )


def _eq_term(term: str):
    """One-arg HOF lambda with the term captured by closure — a default
    arg (``lambda x, t=t``) would make PySpark treat it as the two-arg
    (element, index) form and bind the INDEX column to ``t``."""
    return lambda x: x == F.lit(term)


def _bm25_scored_ctes(table: str = "documents") -> str:
    """The shared DuckDB CTE chain ending in ``bm25_scored(doc_id, dl,
    score_micro)`` — hit docs only. Reused by the ``bm25_topk`` oracle and
    the hybrid-fusion oracle so both replay the IDENTICAL ranking, and
    parameterized by table name so the unicode fuzz (test_fuzz_bm25.py)
    can point it at generated corpora."""
    tf_cols = ",\n           ".join(
        f"len(list_filter(string_split(lower(text), ' '), x -> x = '{t}'))"
        f" AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"COUNT(CASE WHEN tf_{t} > 0 THEN 1 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(_score_sql(t, "//") for t in _BM25_TERMS)
    return f"""docs AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dl,
             {tf_cols}
      FROM {table} WHERE text IS NOT NULL),
    stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sdl, {df_cols} FROM docs),
    bm25_scored AS (
      SELECT doc_id, dl, CAST({score} AS BIGINT) AS score_micro
      FROM docs CROSS JOIN stats
      WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0)"""


def _bm25_oracle() -> str:
    """Build the DuckDB twin from the same term list and constants."""
    return f"""
    WITH {_bm25_scored_ctes()}
    SELECT doc_id, dl, score_micro
    FROM bm25_scored
    ORDER BY score_micro DESC, doc_id LIMIT 100
    """


@query("bm25_topk", oracle=_bm25_oracle())
def bm25_topk(spark, sf_dir):
    """BM25 top-k keyword retrieval over the documents table
    (k1 = 1.2, b = 0.75), all-integer so the ranking is engine-exact.

    Two deliberate departures from textbook BM25, both documented in the
    module docstring: constants are cleared into one int64 fraction, and
    idf uses the log-free rational surrogate
    ``floor((2(N-df)+1)*1e6 / (2df+1))`` — the same (N-df+0.5)/(df+0.5)
    core as Robertson idf without the ``ln`` whose last-ulp behavior
    differs across engines (Java ``Math.log`` is not correctly-rounded;
    a floor/hash boundary 1-ulp apart would flip the oracle). Rankings
    for single-term queries are identical to Robertson's; multi-term
    scores weight rare terms more steeply, which is the direction BM25's
    saturation already pushes.

    Spark plan — the 100 TB shape:
    - tf per query term is ``size(filter(words, x = t))`` — a narrow map
      over the token array, NO explode and NO shuffle for term counting;
      only the |terms| expressions run, not a corpus-wide token pivot.
    - corpus stats (N, sum dl, per-term df) are ONE global aggregate
      producing a single row, broadcast back over the scoring scan.
    - the only data shuffle in the whole query is the final top-k
      (TakeOrdered), which ships k rows per partition.
    Two linear passes over the corpus, zero wide shuffles. The words
    array is materialized in a projection BEFORE the per-term filters so
    the tokenizer split runs once per document, not once per term
    (subexpression elimination does not reach into HOF lambdas — the
    measured 7-13x pitfall documented at operators/dedup.py).
    """
    return (
        _bm25_scored_frame(spark, sf_dir)
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(100)
    )


def _bm25_scored_frame(spark, sf_dir):
    """(doc_id, dl, score_micro) for every hit doc — the Spark twin of the
    ``bm25_scored`` CTE, shared by ``bm25_topk`` and ``hybrid_rrf_fusion``."""
    return bm25_scores(load_table(spark, sf_dir, "documents"))


def bm25_scores(d):
    """BM25 scoring of a (doc_id, text, ...) frame — the reusable core
    of ``_bm25_scored_frame``, frame-parameterized so arbitrary corpora
    (incl. the unicode fuzz) run through the identical plan."""
    words = space_tokens("text")
    # Null-text contract, explicit on BOTH sides: Spark's size(NULL
    # array) is -1 (it would silently poison the sdl corpus stat) while
    # DuckDB propagates NULL — so null-text docs are excluded from the
    # ranked corpus outright, on both engines.
    docs = d.filter(F.col("text").isNotNull()).select(
        F.col("doc_id"), words.alias("_w")
    ).select(
        "doc_id",
        F.size("_w").alias("dl"),
        *[
            F.size(F.filter("_w", _eq_term(t))).alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    # The tf frame feeds TWO consumers (the corpus-stats aggregate and the
    # scoring scan); without a materialization barrier Spark recomputes
    # the tokenizer chain for each — measured 44% of query wall at sf1.
    # Checkpoint the NARROW frame (id + 4 ints — ~40 bytes/doc, the
    # "term-stats table" a deployment materializes anyway) so the corpus
    # text is tokenized exactly once per execution.
    docs = docs.localCheckpoint(eager=False, storageLevel=CKPT_DESER)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = docs.crossJoin(F.broadcast(stats))
    score = None
    for t in _BM25_TERMS:
        # Overflow-staged per-term score — same generated text as the
        # oracle modulo the division token (see _score_sql).
        part = F.expr(_score_sql(t, "div"))
        score = part if score is None else score + part
    hit = sum(F.col(f"tf_{t}") for t in _BM25_TERMS) > 0
    return scored.filter(hit).select(
        "doc_id", "dl", score.alias("score_micro")
    )


# Hybrid-fusion constants: per-arm candidate depth and the standard RRF
# smoothing constant (Cormack et al. 2009 use k=60).
_RRF_DEPTH = 50
_RRF_K = 60

# The dense arm's cosine expression — textually identical to the
# `similarity_topk` oracle so the two queries rank by the same doubles.
_COSINE_SQL = """
      ROUND(list_sum(list_transform(list_zip(e.embedding, q.qvec),
                                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * SQRT(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
            4)"""


@query(
    "hybrid_rrf_fusion",
    oracle=f"""
    WITH {_bm25_scored_ctes()},
    sparse AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS bm25_rank
      FROM bm25_scored ORDER BY score_micro DESC, doc_id LIMIT {_RRF_DEPTH}),
    q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    dense0 AS (
      SELECT e.vec_id AS doc_id, {_COSINE_SQL} AS sim
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
    dense AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS cos_rank
      FROM dense0 ORDER BY sim DESC, doc_id LIMIT {_RRF_DEPTH}),
    fused AS (
      SELECT COALESCE(s.doc_id, de.doc_id) AS doc_id,
             COALESCE(s.bm25_rank, 0) AS bm25_rank,
             COALESCE(de.cos_rank, 0) AS cos_rank,
             COALESCE(1000000 // ({_RRF_K} + s.bm25_rank), 0)
               + COALESCE(1000000 // ({_RRF_K} + de.cos_rank), 0) AS rrf_micro
      FROM sparse s FULL OUTER JOIN dense de ON s.doc_id = de.doc_id)
    SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
           CAST(cos_rank AS BIGINT) AS cos_rank,
           CAST(rrf_micro AS BIGINT) AS rrf_micro
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 20
    """,
)
def hybrid_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval: BM25 (sparse) and embedding-cosine (dense) top-50
    lists fused by reciprocal-rank fusion — ``sum(1e6 div (60 + rank))``
    over the arms a doc appears in, the standard integer-exact RRF
    (k = 60). Docs missing from an arm report rank 0 and contribute
    nothing, so the output is null-free and the oracle hash is immune to
    nullable-int64 pandas coercion.

    This is the retrieval shape RAG/eval pipelines actually run: neither
    arm alone is robust (BM25 misses paraphrase, dense misses rare
    exact terms); RRF needs only ranks, no score calibration across arms.

    Spark plan — the 100 TB shape: each arm is a corpus scan + a
    TakeOrderedAndProject shipping 50 rows per partition; the rank
    row_number then runs on 50 rows (a one-partition window is fine AFTER
    the top-k cut, never before). The fusion join touches <=100 rows.
    Ranking is engine-exact on both arms: BM25 scores are int64 and the
    cosine is the same ROUND(..., 4) double `similarity_topk` already
    hash-matches.
    """
    sparse = (
        _bm25_scored_frame(spark, sf_dir)
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score_micro"), "doc_id"))
            .alias("bm25_rank"),
        )
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    dense = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_sim(F.col("embedding"), F.col("qvec")), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), "doc_id")
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("sim"), "doc_id"))
            .alias("cos_rank"),
        )
    )
    fused = sparse.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
        F.coalesce("cos_rank", F.lit(0)).alias("cos_rank"),
    )
    rrf = F.coalesce(
        F.expr(f"CASE WHEN bm25_rank > 0 THEN 1000000 div ({_RRF_K} + bm25_rank) END"),
        F.lit(0),
    ) + F.coalesce(
        F.expr(f"CASE WHEN cos_rank > 0 THEN 1000000 div ({_RRF_K} + cos_rank) END"),
        F.lit(0),
    )
    return (
        fused.select(
            "doc_id", "bm25_rank", "cos_rank", rrf.alias("rrf_micro")
        )
        .orderBy(F.desc("rrf_micro"), "doc_id")
        .limit(20)
    )


_EPOCHS = 2
_SHARDS = 16


@query(
    "training_order_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT e.epoch, d.doc_id,
             {hash60_sql("CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")} AS k
      FROM documents d
      CROSS JOIN (VALUES {", ".join(f"({e})" for e in range(_EPOCHS))}) AS e(epoch)),
    placed AS (
      SELECT epoch, doc_id, k % {_SHARDS} AS shard_id,
             ROW_NUMBER() OVER (PARTITION BY epoch, k % {_SHARDS}
                                ORDER BY k, doc_id) AS position
      FROM keyed)
    SELECT epoch, shard_id, position, doc_id
    FROM placed
    ORDER BY epoch, shard_id, position LIMIT 400
    """,
)
def training_order_shuffle(spark, sf_dir):
    """Deterministic epoch-varying training-order shuffle, sharded.

    The data-loader contract for LLM training: every epoch visits the
    whole corpus exactly once in a pseudo-random order that (a) is
    reproducible bit-for-bit from (epoch, doc_id) alone — resumable from
    any step with no stored permutation — and (b) differs across epochs.
    The order key is the portable 60-bit md5 hash of ``epoch:doc_id``.

    Scale design: a GLOBAL row_number would serialize onto one partition
    — the classic 100 TB anti-pattern — so the permutation is sharded
    first (``hash % n_shards``) and positions are assigned WITHIN each
    (epoch, shard): one hash-partitioned exchange, then each window sorts
    only its shard's slice, all shards in parallel. Consumers read
    shard files independently; the global order is (shard round-robin x
    position), which is exactly how packed shard manifests are consumed
    (see ``shard_manifest``). Collision ties break on doc_id, so the
    order is total and engine-exact.
    """
    d = load_table(spark, sf_dir, "documents")
    placed = training_order(d, "doc_id")
    return placed.orderBy("epoch", "shard_id", "position").limit(400)


def training_order(df, id_col: str, epochs: int = _EPOCHS,
                   shards: int = _SHARDS):
    """(epoch, shard_id, position, id) for every row of ``df`` — the
    reusable core of ``training_order_shuffle`` (see its docstring for
    the scale rationale)."""
    spark = df.sparkSession
    ep = spark.range(epochs).select(F.col("id").alias("epoch"))
    keyed = df.crossJoin(F.broadcast(ep)).select(
        "epoch",
        F.col(id_col).alias("doc_id"),
        hash60(
            F.concat_ws(
                ":",
                F.col("epoch").cast("string"),
                F.col(id_col).cast("string"),
            )
        ).alias("k"),
    )
    return keyed.select(
        "epoch",
        (F.col("k") % shards).alias("shard_id"),
        F.row_number()
        .over(
            Window.partitionBy("epoch", F.col("k") % shards).orderBy(
                "k", "doc_id"
            )
        )
        .alias("position"),
        "doc_id",
    )
