"""Round-3 additions: winnowing fingerprints, exact-span dedup,
embedding quantization, per-dimension stats.

Each operator gets (a) a semantic property test against an independent
pure-Python recomputation on real fixture data, and (b) an edge-case
test on crafted rows. Oracle parity is covered by the strict sweep
(tools/strict_check.py); these tests assert the MATH, not just
cross-engine agreement.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from delta_unity_duckdb_spark.operators import dedup as D
from delta_unity_duckdb_spark.sources.tables import load_table

WS_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")


def _hash31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % (1 << 31)


def _py_winnow(text: str, k: int = 4, w: int = 4) -> set[int]:
    """Independent reference winnowing (Schleimer et al. fig. 6 spirit,
    with the operator's packed-key rightmost-min tiebreak)."""
    words = WS_SPLIT.split(text.lower())
    grams = [" ".join(words[i : i + k]) for i in range(max(len(words) - k + 1, 0))]
    hs = [_hash31(g) for g in grams]
    if not hs:
        return set()
    B = D.WINNOW_POS_MOD
    keys = [h * B + (B - 1 - (p % B)) for p, h in enumerate(hs)]
    out = set()
    for start in range(max(len(hs) - w, 0) + 1):
        out.add(min(keys[start : start + w]) // B)
    return out


class TestWinnowing:
    def test_matches_reference_implementation(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").limit(50)
        rows = {r.doc_id: r.text for r in docs.collect()}
        got = (
            D.winnow_fingerprints(docs, "doc_id", "text", k=4, w=4)
            .groupBy("id")
            .agg({"fp": "collect_set"})
            .collect()
        )
        got_map = {r[0]: set(r[1]) for r in got}
        for doc_id, text in rows.items():
            expect = _py_winnow(text, 4, 4)
            if expect:
                assert got_map[doc_id] == expect, f"doc {doc_id}"
            else:
                assert doc_id not in got_map

    def test_shared_run_guarantee(self, spark):
        """Any shared run of k+w-1 tokens must yield >=1 shared fp."""
        shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = k+w-1 tokens
        df = spark.createDataFrame(
            [
                (1, f"one two three {shared} four five six"),
                (2, f"{shared} unrelated words here entirely different"),
            ],
            "doc_id long, text string",
        )
        fps = D.winnow_fingerprints(df, "doc_id", "text", k=4, w=4)
        a = {r.fp for r in fps.filter("id = 1").collect()}
        b = {r.fp for r in fps.filter("id = 2").collect()}
        assert a & b, "shared 7-token run produced no shared fingerprint"

    def test_short_doc_single_window(self, spark):
        """Docs with fewer than w shingles keep one clipped window."""
        df = spark.createDataFrame(
            [(1, "just four tiny words"), (2, "ab")],
            "doc_id long, text string",
        )
        fps = D.winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect()
        by_id = {}
        for r in fps:
            by_id.setdefault(r.id, set()).add(r.fp)
        # doc 1: exactly one 4-gram -> exactly one fingerprint = its hash
        assert by_id[1] == {_hash31("just four tiny words")}
        # doc 2: zero 4-grams -> no fingerprints
        assert 2 not in by_id

    def test_sampling_density(self, spark, sf_dir):
        """Winnowing keeps far fewer fingerprints than raw shingles but
        more than 1/w of them (expected density 2/(w+1))."""
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents")
        n_shingles = docs.select(
            F.explode(D._shingles(F.col("text"), 4)).alias("s")
        ).count()
        n_fps = D.winnow_fingerprints(docs, "doc_id", "text", k=4, w=4).count()
        assert n_fps < 0.8 * n_shingles
        assert n_fps > 0.1 * n_shingles


class TestExactSpanDedup:
    def test_copied_paragraph_detected(self, spark):
        para = " ".join(f"tok{i}" for i in range(12))
        rows = [
            (1, para + " tail one here now extra words padding"),
            (2, "lead in words before the copy " + para),
            (3, " ".join(f"other{i}" for i in range(20))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from delta_unity_duckdb_spark.workload.llm import exact_span_dedup
        from unittest import mock

        with mock.patch(
            "delta_unity_duckdb_spark.workload.llm.load_table",
            return_value=df,
        ):
            out = {r.doc_id: r for r in exact_span_dedup(spark, "ignored").collect()}
        # the 12-token paragraph has 5 distinct 8-grams, all shared
        assert out[1].dup_spans == 5
        assert out[2].dup_spans == 5
        assert out[3].dup_spans == 0
        assert out[3].dup_ratio == 0.0
        assert out[1].n_spans > out[1].dup_spans  # tail spans are unique

    def test_ratio_bounds(self, spark, sf_dir):
        from delta_unity_duckdb_spark.workload.llm import exact_span_dedup

        rows = exact_span_dedup(spark, sf_dir).collect()
        assert rows, "fixture docs should produce spans"
        for r in rows:
            assert 0 <= r.dup_spans <= r.n_spans
            assert 0.0 <= r.dup_ratio <= 1.0


class TestEmbeddingQuantization:
    def test_error_bound_and_fidelity(self, spark, sf_dir):
        """MSE of int8 symmetric quantization is bounded by (scale/2)^2
        per element; cosine fidelity stays near 1."""
        from delta_unity_duckdb_spark.workload.llm import embedding_quantization

        rows = embedding_quantization(spark, sf_dir).collect()
        assert rows
        for r in rows:
            half = r.scale_r / 2
            assert r.mse <= half * half + 1e-12, f"vec {r.vec_id}"
            assert r.cos_fid > 0.999, f"vec {r.vec_id}: {r.cos_fid}"

    def test_numpy_reference(self, spark, sf_dir):
        import numpy as np

        e = load_table(spark, sf_dir, "embeddings").limit(20).collect()
        from delta_unity_duckdb_spark.workload.llm import embedding_quantization

        got = {
            r.vec_id: r
            for r in embedding_quantization(spark, sf_dir).collect()
        }
        for row in e:
            x = np.array(row.embedding, dtype=np.float64)
            amax = np.abs(x).max()
            if amax == 0:
                assert row.vec_id not in got
                continue
            scale = amax / 127.0
            q = np.clip(np.floor(x / scale + 0.5), -127, 127)
            mse = float(((x - q * scale) ** 2).mean())
            cos = float(
                (x @ q) / (np.linalg.norm(x) * np.linalg.norm(q))
            )
            assert got[row.vec_id].mse == pytest.approx(mse, abs=2e-9)
            assert got[row.vec_id].cos_fid == pytest.approx(cos, abs=2e-6)


class TestEmbeddingDimStats:
    def test_numpy_reference(self, spark, sf_dir):
        import numpy as np

        from delta_unity_duckdb_spark.workload.llm import embedding_dim_stats

        mat = np.array(
            [r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()],
            dtype=np.float64,
        )
        fp = np.floor(mat * 1e6 + 0.5)
        mean = fp.mean(axis=0) / 1e6
        var = (
            (fp * fp).mean(axis=0) - fp.mean(axis=0) ** 2
        ) / 1e12
        rows = embedding_dim_stats(spark, sf_dir).collect()
        assert len(rows) == mat.shape[1]
        for r in rows:
            assert r.n == mat.shape[0]
            assert r.mean_r == pytest.approx(mean[r.dim], abs=1e-8)
            assert r.var_r == pytest.approx(var[r.dim], abs=1e-8)

    def test_partition_independence(self, spark, sf_dir):
        """Fixed-point accumulation => identical output at any
        parallelism (the whole point of the int64 quantization)."""
        from delta_unity_duckdb_spark.workload.llm import embedding_dim_stats

        base = embedding_dim_stats(spark, sf_dir).collect()
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            alt = embedding_dim_stats(spark, sf_dir).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert base == alt


class TestPcaTopComponent:
    def _spark_loadings(self, spark, sf_dir, df=None):
        from delta_unity_duckdb_spark.operators.pca import pca_top_component

        if df is None:
            df = load_table(spark, sf_dir, "embeddings")
        rows = pca_top_component(df, spark, "embedding", iters=24).collect()
        return [r.loading for r in sorted(rows, key=lambda r: r.dim)], rows[0].eigenvalue

    def test_rayleigh_near_lambda_max(self, spark, sf_dir):
        """The fixed-point iterate must capture (almost) all of the true
        dominant eigenvalue of the float covariance."""
        import numpy as np

        v, lam = self._spark_loadings(spark, sf_dir)
        mat = np.array(
            [r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()],
            dtype=np.float64,
        )
        cov = np.cov(mat, rowvar=False, bias=True)
        lam_max = float(np.linalg.eigvalsh(cov).max())
        v = np.array(v)
        rq = float(v @ cov @ v / (v @ v))
        assert rq > 0.95 * lam_max
        assert abs(lam - rq) < 0.05 * lam_max
        assert abs(float(v @ v) - 1.0) < 1e-3  # unit norm on the 1e-6 grid

    def test_sign_convention(self, spark, sf_dir):
        v, _ = self._spark_loadings(spark, sf_dir)
        assert max(v, key=abs) > 0

    def test_partition_independence(self, spark, sf_dir):
        base = self._spark_loadings(spark, sf_dir)
        df = load_table(spark, sf_dir, "embeddings").repartition(7)
        alt = self._spark_loadings(spark, sf_dir, df)
        assert base == alt

    def test_planted_component(self, spark):
        """Data lying (noisily) along one axis must recover that axis."""
        import numpy as np

        rng = np.random.RandomState(7)
        d = 8
        axis = np.zeros(d)
        axis[3] = 1.0
        pts = (
            np.outer(rng.randn(200) * 5.0, axis)
            + rng.randn(200, d) * 0.05
        )
        df = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
            "vec_id long, embedding array<float>",
        )
        from delta_unity_duckdb_spark.operators.pca import pca_top_component

        rows = pca_top_component(df, spark, "embedding", iters=24).collect()
        v = np.array([r.loading for r in sorted(rows, key=lambda r: r.dim)])
        assert abs(v[3]) > 0.99
        assert rows[0].eigenvalue > 20.0


class TestCentroidOutliers:
    def test_numpy_reference(self, spark, sf_dir):
        import numpy as np

        from delta_unity_duckdb_spark.workload.llm import (
            embedding_centroid_outliers,
        )

        rows = load_table(spark, sf_dir, "embeddings").collect()
        mat = np.array([r.embedding for r in rows], dtype=np.float64)
        fp = np.floor(mat * 1e6 + 0.5)
        mu = fp.mean(axis=0) / 1e6
        d2 = ((mat - mu) ** 2).sum(axis=1)
        want = sorted(
            zip([r.vec_id for r in rows], d2), key=lambda t: (-t[1], t[0])
        )[:50]
        got = embedding_centroid_outliers(spark, sf_dir).collect()
        assert [g.vec_id for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g.sq_dist == pytest.approx(w[1], abs=2e-6)


class TestAnnRecallEval:
    def test_recall_bounds_and_consistency(self, spark, sf_dir):
        from delta_unity_duckdb_spark.workload.llm import ann_recall_eval

        row = ann_recall_eval(spark, sf_dir).collect()[0]
        assert row.k == 10
        assert row.n_exact == 10
        assert 0 <= row.n_common <= min(row.n_exact, row.n_approx)
        assert row.recall == pytest.approx(row.n_common / 10, abs=1e-9)
        # IVF with nprobe=4/nlist=16 on near-isotropic data still finds
        # a meaningful share of the true neighborhood
        assert row.recall >= 0.2


class TestPcaProjection:
    def test_scores_match_numpy_projection(self, spark, sf_dir):
        """|score| ranking must agree with a float reference projection
        onto the fitted component (grid quantization <= 1e-4 slack)."""
        import numpy as np

        from delta_unity_duckdb_spark.operators.pca import (
            pca_projection_scores,
            pca_top_component,
        )

        e = load_table(spark, sf_dir, "embeddings")
        comp = pca_top_component(e, spark, "embedding", iters=24).collect()
        v = np.array([r.loading for r in sorted(comp, key=lambda r: r.dim)])
        rows = e.collect()
        mat = np.array([r.embedding for r in rows], dtype=np.float64)
        ref = {r.vec_id: float(m @ v) for r, m in zip(rows, mat)}
        got = pca_projection_scores(e, spark, "embedding", "vec_id", iters=24).collect()
        assert len(got) == len(rows)
        for r in got:
            assert r.score == pytest.approx(ref[r.vec_id], abs=1e-3)

    def test_partition_independence(self, spark, sf_dir):
        from delta_unity_duckdb_spark.operators.pca import pca_projection_scores

        e = load_table(spark, sf_dir, "embeddings")
        a = sorted(map(tuple, pca_projection_scores(e, spark).collect()))
        b = sorted(
            map(tuple, pca_projection_scores(e.repartition(7), spark).collect())
        )
        assert a == b
