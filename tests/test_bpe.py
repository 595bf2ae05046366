"""BPE vocabulary induction (operators/bpe.py): the Spark merge loop vs
a pure-Python reference implementation of classic BPE, and vs the DuckDB
unrolled-CTE oracle, on corpora chosen to hit the tricky semantics —
greedy non-overlapping merges ('aaaa'), merged symbols feeding later
pairs, count tie-breaks, and early termination when no pair remains."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_unity_duckdb_spark.operators import bpe as B


# ---------------------------------------------------------------- reference
def _ref_bpe(word_counts: dict[str, int], iters: int):
    """Classic BPE on a word-frequency dict: greedy left-to-right
    non-overlapping merge of the (count DESC, lhs, rhs) argmax pair."""
    state = [(list(w), c) for w, c in sorted(word_counts.items())]
    merges = []
    for step in range(1, iters + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in state:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, lhs + rhs, cnt))
        new_state = []
        for syms, c in state:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == lhs and x == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(x)
            new_state.append((out, c))
        state = new_state
    return merges


def _spark_merges(spark, words: list[str], iters: int = 4):
    df = spark.createDataFrame([(w,) for w in words], "text string")
    return [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in B.bpe_merge_table(df, "text", iters=iters).orderBy("step").collect()
    ]


def _duck_merges(words: list[str], iters: int = 4):
    con = duckdb.connect()
    con.register("corpus", pd.DataFrame({"text": words}))
    return [
        tuple(r)
        for r in con.execute(
            B.bpe_merges_sql("corpus", "text", iters=iters)
        ).fetchall()
    ]


def _counts(words: list[str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for w in words:
        for t in w.lower().split():
            if t.isascii() and t.isalpha():
                out[t.lower()] = out.get(t.lower(), 0) + 1
    return out


def test_known_corpus_matches_reference(spark):
    # the classic BPE toy corpus: 'low lower newest widest' shapes
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    got = _spark_merges(spark, words, iters=5)
    want = _ref_bpe(_counts(words), 5)
    assert got == want
    # merged symbols must feed later rounds (e+s, then es+t)
    assert any(len(m[1]) > 1 or len(m[2]) > 1 for m in got)


def test_greedy_overlap_aaaa(spark):
    # The pair CENSUS counts every adjacency — 'aaaa' has 3 (a,a) —
    # but the MERGE is greedy non-overlapping: 'aaaa' → [aa, aa],
    # so round 2's argmax is (aa, aa) with count 4, not (a, aa).
    words = ["aaaa"] * 4 + ["ab"]
    got = _spark_merges(spark, words, iters=2)
    want = _ref_bpe(_counts(words), 2)
    assert got == want
    assert got[0][:3] == (1, "a", "a") and got[0][4] == 12  # 3 per word × 4
    assert got[1][:3] == (2, "aa", "aa") and got[1][4] == 4


def test_early_termination_when_fully_merged(spark):
    # one distinct 2-char word: round 1 merges it whole, round 2 finds
    # no pairs — both engines emit exactly one merge row.
    words = ["ab"] * 3
    got = _spark_merges(spark, words, iters=4)
    duck = _duck_merges(words, iters=4)
    assert got == duck == [(1, "a", "b", "ab", 3)]


def test_tie_break_is_lexicographic(spark):
    # 'ba' and 'ab' each twice: pairs (a,b) and (b,a) tie at 2 —
    # both engines must pick (a,b).
    words = ["ab", "ab", "ba", "ba"]
    got = _spark_merges(spark, words, iters=1)
    duck = _duck_merges(words, iters=1)
    assert got == duck
    assert got[0][1:3] == ("a", "b")


def test_vocab_cap_boundary_deterministic(spark):
    # cap=2 keeps the two most frequent words; ties at the boundary
    # break by word ascending in both engines.
    words = ["zed"] * 3 + ["yak"] * 2 + ["xis"] * 2 + ["who"]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in B.bpe_merge_table(df, "text", iters=3, vocab_cap=2)
        .orderBy("step")
        .collect()
    ]
    con = duckdb.connect()
    con.register("corpus", pd.DataFrame({"text": words}))
    duck = [
        tuple(r)
        for r in con.execute(
            B.bpe_merges_sql("corpus", "text", iters=3, vocab_cap=2)
        ).fetchall()
    ]
    assert got == duck
    # cap kept {zed×3, xis×2} (xis < yak), so no 'y' symbol appears
    assert all("y" not in m[3] for m in got)


_WORD = st.text(alphabet="ab", min_size=1, max_size=5)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=st.lists(_WORD, min_size=1, max_size=15))
def test_fuzz_cross_engine_and_reference(spark, words):
    """Tiny-alphabet fuzz: dense pair collisions and deep merge chains.
    Spark, DuckDB, and the Python reference must agree exactly."""
    got = _spark_merges(spark, words, iters=3)
    duck = _duck_merges(words, iters=3)
    want = _ref_bpe(_counts(words), 3)
    assert got == duck == want


def test_driver_and_distributed_regimes_identical(spark, monkeypatch):
    """Round-9 regime split: vocab_cap <= BPE_DRIVER_MAX_VOCAB runs the
    merge rounds driver-side over the collected capped table (one Spark
    job instead of two per round). Both regimes must be value-identical
    on a corpus that exercises greedy overlap ('aaaa'), merged symbols
    feeding later rounds, tie-breaks, and early stop."""
    words = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["aaaa"] * 4 + ["ab", "ba", "ba"]
    )
    df = spark.createDataFrame([(w,) for w in words], "text string")

    def merges():
        return [
            (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in B.bpe_merge_table(df, "text", iters=8).orderBy("step").collect()
        ]

    def stats():
        r = B.bpe_encode_stats(df, "text", iters=8).collect()[0]
        return (r["n_words"], r["n_chars"], r["n_tokens"], r["tokens_per_char_ppm"])

    assert B.BPE_DRIVER_MAX_VOCAB >= 50_000  # default caps take the driver path
    fast_m, fast_s = merges(), stats()
    monkeypatch.setattr(B, "BPE_DRIVER_MAX_VOCAB", -1)  # force distributed loop
    assert merges() == fast_m == _ref_bpe(_counts(words), 8)
    assert stats() == fast_s
    assert _duck_merges(words, iters=8) == fast_m


@pytest.mark.parametrize("iters", [1, 6])
def test_workload_query_shapes(spark, sf_dir, iters):
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    out = B.bpe_merge_table(d, "text", iters=iters).collect()
    assert 0 < len(out) <= iters
    steps = [r["step"] for r in out]
    assert steps == list(range(1, len(out) + 1))
    # merge table counts are non-increasing (each round's argmax can't
    # exceed the previous round's, which was the global max then)
    cnts = [r["pair_count"] for r in out]
    assert all(a >= b for a, b in zip(cnts, cnts[1:]))


def test_encode_stats_cross_engine_incl_early_stop(spark):
    # 'ab'×3 + 'cd': both words fully merge in 2 rounds; rounds 3-4 are
    # dead. The oracle must carry the final state forward (LEFT JOIN),
    # not empty it — Spark's break keeps the last state.
    words = ["ab"] * 3 + ["cd"]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    got = B.bpe_encode_stats(df, "text", iters=4).collect()[0]
    con = duckdb.connect()
    con.register("corpus", pd.DataFrame({"text": words}))
    duck = con.execute(B.bpe_encode_stats_sql("corpus", "text", iters=4)).fetchone()
    assert (got["n_words"], got["n_chars"], got["n_tokens"], got["tokens_per_char_ppm"]) == duck
    # 4 word-occurrences, 8 chars, every word one merged token
    assert duck == (4, 8, 4, 500_000)
