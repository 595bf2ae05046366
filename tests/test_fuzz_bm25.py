"""Randomized cross-engine fuzz of the BM25 scoring chain: the retrieval
oracles rest on (1) ``lower`` agreeing between Java and utf8proc on the
generated text, (2) the single-space tokenizer producing the same word
arrays, and (3) the all-integer idf/saturation formula dividing
identically. The fixture suite only exercises ASCII word soup; here
hypothesis feeds unicode, punctuation, repeated/odd whitespace, empty
strings, and adversarial term adjacency through BOTH engines and
compares (doc_id, dl, score_micro) value-for-value.

Data reaches DuckDB via a registered pandas frame — no SQL literal
escaping in the loop, so weird characters hit the engines, not the test
encoding."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_unity_duckdb_spark.workload.retrieval import (
    _bm25_scored_ctes,
    bm25_scores,
)

# include the actual query terms often so hits occur, plus unicode noise
_WORD = st.one_of(
    st.sampled_from(
        ["dup", "spark", "merge", "DUP", "Spark", "δέλτα", "日本", "a'b", 'q"w']
    ),
    st.text(min_size=1, max_size=6),
)
_TEXT = st.lists(_WORD, min_size=0, max_size=14).map(" ".join)
_ROWS = st.lists(
    st.tuples(st.integers(0, 40), _TEXT),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS)
def test_bm25_scores_bit_identical_cross_engine(spark, rows):
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["dl"], r["score_micro"])
        for r in bm25_scores(sdf).collect()
    )
    con = duckdb.connect()
    con.register("fuzz", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        map(
            tuple,
            con.execute(
                f"WITH {_bm25_scored_ctes('fuzz')} "
                "SELECT doc_id, dl, score_micro FROM bm25_scored"
            ).fetchall(),
        )
    )
    assert got == want
