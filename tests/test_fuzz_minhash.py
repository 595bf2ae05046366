"""Randomized cross-engine fuzz of the shingle → MinHash → banding path:
the near-dup family's oracles rest on three claims being true for
ARBITRARY text — (1) Spark's ``split`` and DuckDB's
``string_split_regex`` over the shared spelled-out whitespace class
(``[ \\t\\n\\x0B\\f\\r]+`` — Java ``\\s`` includes ``\\x0B``, RE2's does
not, so a bare ``\\s`` diverges) produce the same word arrays,
(2) the md5-derived shingle hash is bit-identical, and (3) the banded
candidate PAIRS therefore agree. The fixture suite only exercises ASCII
word soup; here hypothesis feeds unicode, quotes, backslashes, repeated
whitespace, and empty strings through both engines.

Data reaches DuckDB via a registered pandas frame — no SQL literal
escaping in the loop, so weird characters hit the engines, not the test
encoding."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_unity_duckdb_spark.operators import dedup as D

# words drawn from a small alphabet so duplicate shingles / colliding
# bands actually occur, plus raw unicode noise
_WORD = st.one_of(
    st.sampled_from(["alpha", "beta", "gamma", "δέλτα", "日本", "a'b", 'q"w']),
    st.text(min_size=1, max_size=6),
)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_ROWS = st.lists(
    st.tuples(st.integers(0, 40), _TEXT), min_size=1, max_size=30, unique_by=lambda t: t[0]
)


def _duck(rows):
    con = duckdb.connect()
    con.register("fuzz", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return con


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS)
def test_minhash_candidate_pairs_bit_identical_cross_engine(spark, rows):
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in D.minhash_near_dups(
            sdf, "doc_id", "text", num_perm=16, bands=4
        ).collect()
    )
    con = _duck(rows)
    want = sorted(
        con.execute(
            D.minhash_pairs_sql("fuzz", "doc_id", "text", num_perm=16, bands=4)
        ).fetchall()
    )
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS)
def test_banded_index_rows_match_cross_engine(spark, rows):
    """The persisted LSH index frame (id, band, bucket-equality classes)
    must partition documents identically in both engines: two docs share
    a (band, bucket) in Spark iff they share the (band, sigstr) in
    DuckDB. Compared as the per-band partition of doc ids."""
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    spark_rows = D.minhash_band_buckets(
        sdf, "doc_id", "text", num_perm=16, bands=4
    ).collect()
    got: dict = {}
    for r in spark_rows:
        got.setdefault((r["band"], r["bucket"]), set()).add(r["id"])
    got_parts = sorted(
        [tuple(sorted(v)) for v in got.values()]
    )
    con = _duck(rows)
    duck_rows = con.execute(
        D.minhash_banded_sql("fuzz", "doc_id", "text", num_perm=16, bands=4)
    ).fetchall()
    want: dict = {}
    for doc_id, band, sigstr in duck_rows:
        want.setdefault((band, sigstr), set()).add(doc_id)
    want_parts = sorted([tuple(sorted(v)) for v in want.values()])
    assert got_parts == want_parts


_QTEXT = st.text(min_size=0, max_size=60)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_QTEXT, min_size=1, max_size=20))
def test_quality_score_bit_identical_cross_engine(spark, texts):
    """The floor-quantized quality score (length/punctuation/diversity
    heuristic) must be bit-identical between the Spark expression tree
    and its SQL twin for ARBITRARY unicode — same char-length semantics,
    same regex class, same IEEE evaluation order, floor (not ROUND)
    quantization."""
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators.text import quality_score_raw

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["q"]
        for r in sdf.select(
            "doc_id",
            F.floor(quality_score_raw(F.col("text")) * 10000)
            .cast("long")
            .alias("q"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("fuzz", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = dict(
        con.execute(
            """
            WITH t AS (
              SELECT doc_id, LENGTH(text) AS n_chars,
                     list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                 x -> x <> '') AS toks,
                     LENGTH(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g'))
                       AS punct
              FROM fuzz)
            SELECT doc_id,
                   CAST(FLOOR((LEAST(n_chars / 200.0, 1.0)
                          + (1.0 - LEAST(punct / GREATEST(n_chars, 1) * 5.0, 1.0))
                          + CASE WHEN len(toks) > 0
                                 THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                                      / len(toks)
                                 ELSE 0.0 END) / 3.0 * 10000) AS BIGINT) AS q
            FROM t
            """
        ).fetchall()
    )
    assert got == want


def test_null_text_propagates_to_null_shingles(spark):
    """Null contract (round-4 ADVICE): NULL text -> NULL shingle array so
    non-exploded consumers (F.size / set ops in the minhash + jaccard
    paths) see null, not a spurious empty doc; short-but-present text ->
    empty array; normal text -> populated array."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two"), (4, "one two three four")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            D._shingles(F.col("text"), 3).alias("sh"),
            F.size(D._shingles(F.col("text"), 3)).alias("sz"),
        ).collect()
    }
    assert rows[1].sh is None and rows[1].sz is None
    assert rows[2].sh == [] and rows[2].sz == 0
    assert rows[3].sh == [] and rows[3].sz == 0  # 2 words < n=3
    assert rows[4].sh == ["one two three", "two three four"] and rows[4].sz == 2
