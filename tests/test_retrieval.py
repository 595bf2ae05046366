"""Semantic + plan tests for the retrieval / batch-assembly workload
(bm25_topk, training_order_shuffle, dup_ngram_char_share). Value-level
oracle equality is covered by test_oracle.py; these pin the invariants
the oracle can't see and the plan shapes the 100 TB design relies on."""

from __future__ import annotations

from collections import Counter

import pytest

from delta_unity_duckdb_spark.workload import QUERIES
from delta_unity_duckdb_spark.workload.retrieval import _BM25_TERMS, _SHARDS


@pytest.fixture(scope="module")
def bm25(spark, sf_dir):
    return QUERIES["bm25_topk"](spark, sf_dir).toPandas()


@pytest.fixture(scope="module")
def order(spark, sf_dir):
    return QUERIES["training_order_shuffle"](spark, sf_dir).toPandas()


def _tokens(text: str) -> list[str]:
    return [w for w in text.lower().split(" ") if w]


class TestBm25:
    def test_hits_contain_a_query_term(self, spark, sf_dir, bm25):
        from delta_unity_duckdb_spark.sources.tables import load_table

        texts = dict(
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .toPandas()
            .itertuples(index=False, name=None)
        )
        for doc_id in bm25["doc_id"]:
            assert set(_tokens(texts[doc_id])) & set(_BM25_TERMS)

    def test_scores_positive_and_sorted(self, bm25):
        s = bm25["score_micro"].tolist()
        assert all(x > 0 for x in s)
        assert s == sorted(s, reverse=True)

    def test_score_sql_exact_at_overflow_scale(self, spark):
        """The staged-division score must match exact Python big-int
        arithmetic (and DuckDB) at stats magnitudes where the old naive
        ``44*tf*sdl*1e6`` / ``idf*frac`` products wrap int64 — the
        100 TB-shape regression the round-4 advice flagged. Spark
        (non-ANSI) wraps silently, so a wrong value here would be a
        silent ranking corruption, not an error."""
        import duckdb

        from delta_unity_duckdb_spark.workload.retrieval import _score_sql

        # (tf, dl, n, sdl, df): tf*sdl spans the old 2.1e11 naive ceiling
        # up to ~9e14 (the staged form's documented exactness bound), and
        # the rare-term case has idf ~ 2n*1e6 where n makes idf*frac wrap.
        cases = [
            (3, 400, 1_000, 300_000, 2),                     # small sanity
            (50, 2_000, 1_000_000, 10_000_000_000, 3),        # old frac wrap
            (900, 5_000, 2_000_000_000, 1_000_000_000_000, 1),  # idf wrap
            (7, 120, 4_000_000_000_000, 800_000_000_000, 5),  # huge n
        ]
        rows = [
            {"tf_dup": tf, "dl": dl, "n": n, "sdl": sdl, "df_dup": df}
            for tf, dl, n, sdl, df in cases
        ]

        def exact(tf, dl, n, sdl, df):
            idf = ((2 * (n - df) + 1) * 10**6) // (2 * df + 1)
            frac = (22 * tf * sdl * 10**6) // (
                10 * tf * sdl + 3 * sdl + 9 * dl * n
            )
            return (idf * frac) // 10**6

        expr = _score_sql("dup", "div")
        sdf = spark.createDataFrame(
            rows,
            schema="tf_dup long, dl long, n long, sdl long, df_dup long",
        )
        got_spark = [
            r[0]
            for r in sdf.selectExpr(f"{expr} AS s")
            .toPandas()
            .itertuples(index=False, name=None)
        ]
        con = duckdb.connect()
        got_duck = [
            con.execute(
                f"SELECT {_score_sql('dup', '//')} FROM (SELECT "
                f"CAST({tf} AS BIGINT) AS tf_dup, "
                f"CAST({dl} AS BIGINT) AS dl, CAST({n} AS BIGINT) AS n, "
                f"CAST({sdl} AS BIGINT) AS sdl, "
                f"CAST({df} AS BIGINT) AS df_dup)"
            ).fetchone()[0]
            for tf, dl, n, sdl, df in cases
        ]
        want = [exact(*c) for c in cases]
        assert got_spark == want
        assert got_duck == want
        assert all(0 < v < 2**63 for v in want)

    def test_rare_term_outweighs_common_equal_tf(self, spark, sf_dir):
        """idf monotonicity: among docs with tf=1 for exactly one query
        term and comparable length, the rare term ('dup', df~5%) must
        score above a common term ('spark', df~77%)."""
        from delta_unity_duckdb_spark.sources.tables import load_table

        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .toPandas()
        )
        full = QUERIES["bm25_topk"](spark, sf_dir)
        scores = dict(
            full.select("doc_id", "score_micro")
            .toPandas()
            .itertuples(index=False, name=None)
        )
        best = {}
        for _, row in docs.iterrows():
            toks = _tokens(row["text"])
            c = Counter(toks)
            hits = {t: c.get(t, 0) for t in _BM25_TERMS}
            only = [t for t in _BM25_TERMS if hits[t] == 1]
            if sum(hits.values()) == 1 and only and row["doc_id"] in scores:
                t = only[0]
                key = (t, len(toks) // 20)  # bucket by length
                best.setdefault(key, scores[row["doc_id"]])
        for bucket in {k[1] for k in best}:
            if ("dup", bucket) in best and ("spark", bucket) in best:
                assert best[("dup", bucket)] > best[("spark", bucket)]
                return
        pytest.skip("fixture has no comparable single-hit pair in the top-k")


class TestTrainingOrder:
    def test_positions_dense_from_one(self, order):
        for (_, _), g in order.groupby(["epoch", "shard_id"]):
            pos = sorted(g["position"].tolist())
            assert pos == list(range(1, len(pos) + 1))

    def test_shard_ids_in_range(self, order):
        assert order["shard_id"].between(0, _SHARDS - 1).all()

    def test_epochs_permute_differently_and_cover_corpus(
        self, spark, sf_dir
    ):
        """Full-frame contract (the query's LIMIT hides epoch 1): every
        epoch is a complete permutation of the corpus, and the two
        epochs order shard 0 differently."""
        from delta_unity_duckdb_spark.sources.tables import load_table
        from delta_unity_duckdb_spark.workload.retrieval import (
            training_order,
        )

        d = load_table(spark, sf_dir, "documents")
        df = training_order(d, "doc_id").toPandas()
        all_ids = set(
            d.select("doc_id").toPandas()["doc_id"].tolist()
        )
        for e in (0, 1):
            assert set(df[df["epoch"] == e]["doc_id"]) == all_ids
        seq = {
            e: g.sort_values("position")["doc_id"].tolist()
            for e, g in df[df["shard_id"] == 0].groupby("epoch")
        }
        assert len(seq) == 2 and seq[0] != seq[1]

    def test_deterministic_rerun(self, spark, sf_dir, order):
        again = QUERIES["training_order_shuffle"](spark, sf_dir).toPandas()
        assert again.equals(order)


class TestDupNgramShare:
    def test_matches_python_recompute(self, spark, sf_dir):
        from delta_unity_duckdb_spark.sources.tables import load_table

        res = QUERIES["dup_ngram_char_share"](spark, sf_dir).toPandas()
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text", "n_chars")
            .toPandas()
            .set_index("doc_id")
        )
        for _, row in res.head(25).iterrows():
            text = docs.loc[row["doc_id"], "text"]
            words = text.lower().split(" ")  # fixture has single spaces
            grams = Counter(
                " ".join(words[i : i + 2]) for i in range(len(words) - 1)
            )
            mc = max(grams.values())
            top = min(g for g, c in grams.items() if c == mc)
            assert row["top_gram"] == top and row["max_cnt"] == mc
            expect = mc * len(top) * 1_000_000 // int(
                docs.loc[row["doc_id"], "n_chars"]
            )
            assert row["share_ppm"] == expect


class TestPlans:
    def test_bm25_no_explode_no_wide_shuffle(self, spark, sf_dir):
        """tf counting must be a narrow array map: no Generate (explode)
        anywhere, stats joined via broadcast, top-k via TakeOrdered."""
        from tests.test_plans import plan_of

        p = plan_of(QUERIES["bm25_topk"](spark, sf_dir))
        assert "Generate" not in p
        assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
        assert "TakeOrderedAndProject" in p
        assert "CartesianProduct" not in p

    def test_training_order_window_is_shard_partitioned(self, spark, sf_dir):
        """The row_number window must partition by (epoch, shard) — a
        global (empty-partition) window would serialize 100 TB onto one
        task."""
        from tests.test_plans import plan_of

        p = plan_of(QUERIES["training_order_shuffle"](spark, sf_dir))
        assert "Window" in p
        assert "partitionBy" not in p or "epoch" in p
        assert "hashpartitioning(epoch" in p
        assert "CartesianProduct" not in p

    def test_dup_ngram_zero_shuffle(self, spark, sf_dir):
        """The round-6 rework made the per-doc bigram argmax a
        zero-shuffle Arrow kernel (each doc's top bigram is local to its
        row — no exchange was ever needed): the plan must contain NO
        hashpartitioning exchange at all — the only data movement is the
        final TakeOrdered — and obviously no CartesianProduct. This
        supersedes the old pin (one doc_id exchange + AQE
        ReusedExchange), which described the pre-rework exploded-gram
        dataflow."""
        from tests.test_plans import plan_of

        df = QUERIES["dup_ngram_char_share"](spark, sf_dir)
        p = plan_of(df)
        assert "CartesianProduct" not in p
        assert p.count("Exchange hashpartitioning") == 0
        assert "TakeOrderedAndProject" in p
