"""Invariant tests for the round-4 batch-assembly additions:
hybrid_rrf_fusion, leakage_safe_split, token_budget_mixture. Value-level
oracle equality is covered by test_oracle.py; these pin the semantics the
oracle hash can't articulate (no-leakage, prefix maximality, fusion
arithmetic) via independent driver-side recomputation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload import QUERIES
from delta_unity_duckdb_spark.workload.retrieval import (
    _RRF_DEPTH,
    _RRF_K,
    _bm25_scored_frame,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestHybridRrf:
    @pytest.fixture(scope="class")
    def fused(self, spark, sf_dir):
        return QUERIES["hybrid_rrf_fusion"](spark, sf_dir).toPandas()

    def test_sorted_and_positive(self, fused):
        s = fused["rrf_micro"].tolist()
        assert s == sorted(s, reverse=True)
        assert all(x > 0 for x in s)

    def test_rrf_arithmetic_from_ranks(self, fused):
        for _, r in fused.iterrows():
            want = 0
            if r["bm25_rank"] > 0:
                want += 1000000 // (_RRF_K + int(r["bm25_rank"]))
            if r["cos_rank"] > 0:
                want += 1000000 // (_RRF_K + int(r["cos_rank"]))
            assert r["rrf_micro"] == want

    def test_ranks_match_independent_arm_rankings(self, spark, sf_dir, fused):
        sparse = (
            _bm25_scored_frame(spark, sf_dir)
            .orderBy(F.desc("score_micro"), "doc_id")
            .limit(_RRF_DEPTH)
            .toPandas()
        )
        sparse_rank = {d: i + 1 for i, d in enumerate(sparse["doc_id"])}
        e = load_table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qvec")
        )
        from delta_unity_duckdb_spark.operators.similarity import cosine_sim

        dense = (
            e.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(
                F.col("vec_id").alias("doc_id"),
                F.round(
                    cosine_sim(F.col("embedding"), F.col("qvec")), 4
                ).alias("sim"),
            )
            .orderBy(F.desc("sim"), "doc_id")
            .limit(_RRF_DEPTH)
            .toPandas()
        )
        dense_rank = {d: i + 1 for i, d in enumerate(dense["doc_id"])}
        for _, r in fused.iterrows():
            assert int(r["bm25_rank"]) == sparse_rank.get(r["doc_id"], 0)
            assert int(r["cos_rank"]) == dense_rank.get(r["doc_id"], 0)

    def test_fusion_beats_single_arm_membership(self, fused):
        """At least one returned doc must come from each arm (the fixture
        corpus has both keyword hits and dense neighbors) — i.e. the
        fusion is not degenerate to one ranker."""
        assert (fused["bm25_rank"] > 0).any()
        assert (fused["cos_rank"] > 0).any()


class TestLeakageSafeSplit:
    @pytest.fixture(scope="class")
    def split(self, spark, sf_dir):
        return QUERIES["leakage_safe_split"](spark, sf_dir).toPandas()

    @pytest.fixture(scope="class")
    def clusters(self, spark, sf_dir):
        from delta_unity_duckdb_spark.operators import dedup as D

        d = load_table(spark, sf_dir, "documents")
        return (
            D.near_dup_clusters(d, "doc_id", "text")
            .select("id", "cluster")
            .toPandas()
        )

    def test_totals_cover_corpus(self, spark, sf_dir, split):
        n = load_table(spark, sf_dir, "documents").count()
        assert split["n_docs"].sum() == n
        assert set(split["split"]) <= {"train", "val", "test"}

    def test_no_cluster_spans_splits(self, split, clusters):
        """The defining invariant: split is a pure function of cluster,
        recomputed independently with hashlib md5."""
        by_split: dict[str, set[int]] = {"train": set(), "val": set(), "test": set()}
        for _, r in clusters.iterrows():
            b = _h60(str(int(r["cluster"]))) % 10
            s = "train" if b < 8 else ("val" if b == 8 else "test")
            by_split[s].add(int(r["cluster"]))
        assert not (by_split["train"] & by_split["val"])
        assert not (by_split["train"] & by_split["test"])
        assert not (by_split["val"] & by_split["test"])
        got = dict(zip(split["split"], split["n_clusters"]))
        for s, cl in by_split.items():
            assert got.get(s, 0) == len(cl)

    def test_dup_docs_counted(self, split, clusters):
        sizes = clusters.groupby("cluster").size()
        dup_clusters = set(sizes[sizes > 1].index)
        want = 0
        for _, r in clusters.iterrows():
            if int(r["cluster"]) in dup_clusters:
                want += 1
        assert split["n_dup_docs"].sum() == want
        assert want > 0  # fixture has real near-dup families


class TestTokenBudgetMixture:
    @pytest.fixture(scope="class")
    def mix(self, spark, sf_dir):
        return QUERIES["token_budget_mixture"](spark, sf_dir).toPandas()

    @pytest.fixture(scope="class")
    def docs(self, spark, sf_dir):
        d = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        w = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        return d.select(
            "source", "doc_id", F.size(w).alias("n_tok")
        ).toPandas()

    def test_within_budget_or_source_exhausted(self, mix, docs):
        per_source_docs = docs.groupby("source")["doc_id"].count()
        for _, r in mix.iterrows():
            assert (
                r["tokens_sel"] <= r["budget_tokens"]
                or r["n_docs_sel"] == per_source_docs[r["source"]]
            )
            assert r["tokens_sel"] <= r["src_tokens"]

    def test_prefix_maximality(self, mix, docs):
        """The selection is the LONGEST prefix of the hash order that fits
        the budget: the next unselected doc would overflow it."""
        order = {}
        for _, r in docs.iterrows():
            h = _h60(f"tb:{int(r['doc_id'])}")
            order.setdefault(r["source"], []).append(
                (h % 64, h, int(r["doc_id"]), int(r["n_tok"]))
            )
        for src, rows in order.items():
            rows.sort()
            row = mix[mix["source"] == src].iloc[0]
            budget, n_sel = int(row["budget_tokens"]), int(row["n_docs_sel"])
            # Mirror the engine exactly: the running sum accumulates over
            # EVERY doc in order (selection = cumsum <= budget), so once a
            # doc overflows, later zero-token docs stay excluded too.
            run_total = 0
            want_sel = 0
            run_sel = 0
            for _, _, _, tok in rows:
                run_total += tok
                if run_total <= budget:
                    want_sel += 1
                    run_sel = run_total
            assert n_sel == want_sel
            assert int(row["tokens_sel"]) == run_sel

    def test_budget_totals_forty_percent(self, mix, docs):
        total = int(docs["n_tok"].sum())
        b40 = total * 2 // 5
        got = int(mix["budget_tokens"].sum())
        # each source floors twice (w_ppm and the split product): the sum
        # undershoots b40 by at most ~2 tokens per source, never exceeds
        assert got <= b40
        assert got >= b40 - 2 * len(mix) - b40 * len(mix) // 1000000


class TestMarkupExtract:
    @pytest.fixture(scope="class")
    def ex(self, spark, sf_dir):
        return QUERIES["markup_text_extract"](spark, sf_dir).toPandas()

    def test_extraction_recompute(self, spark, sf_dir, ex):
        """Independent Python recompute of the full regex chain."""
        import re

        texts = dict(
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .orderBy("doc_id")
            .limit(500)
            .toPandas()
            .itertuples(index=False, name=None)
        )
        for _, r in ex.iterrows():
            t = texts[r["doc_id"]]
            if r["doc_id"] % 3 == 0:
                html = (
                    '<nav><a href="/">home</a></nav><div class="content"><p>'
                    + t
                    + '</p></div><script type="text/javascript">var t=1;</script>'
                )
            else:
                html = t
            got = re.sub(r"<script[^>]*>[^<]*</script>", " ", html)
            got = re.sub(r"<[^>]*>", " ", got)
            got = re.sub(r" +", " ", got).strip()
            assert r["raw_len"] == len(html)
            assert r["extracted_len"] == len(got)
            assert r["preview"] == got[:40]
            assert r["retention_ppm"] == len(got) * 1000000 // max(len(html), 1)

    def test_markup_docs_lose_scaffolding_only(self, ex):
        """Marked-up docs retain their text (plus the nav word) — the
        script PAYLOAD must be gone, so retention is well below 1e6 but
        the extracted text is never empty."""
        m = ex[ex["had_markup"]]
        assert (m["retention_ppm"] < 1000000).all()
        assert (m["extracted_len"] > 0).all()
        clean = ex[~ex["had_markup"]]
        assert (clean["retention_ppm"] <= 1000000).all()


class TestContextLengthSweep:
    @pytest.fixture(scope="class")
    def sweep(self, spark, sf_dir):
        return QUERIES["context_length_sweep"](spark, sf_dir).toPandas()

    def test_monotone_in_ctx(self, sweep):
        s = sweep.sort_values("ctx")
        assert s["docs_truncated"].is_monotonic_decreasing
        assert s["tokens_lost"].is_monotonic_decreasing
        assert s["n_sequences"].is_monotonic_decreasing
        # one corpus: total tokens identical across candidates
        assert s["tokens_total"].nunique() == 1
        # non-vacuous: the smallest context must actually truncate
        assert s.iloc[0]["docs_truncated"] > 0

    def test_loss_arithmetic(self, sweep):
        for _, r in sweep.iterrows():
            kept = r["tokens_total"] - r["tokens_lost"]
            assert r["loss_ppm"] == r["tokens_lost"] * 1000000 // max(
                r["tokens_total"], 1
            )
            assert r["n_sequences"] == (kept + r["ctx"] - 1) // r["ctx"]
