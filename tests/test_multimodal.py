"""Multimodal binary-column pipeline tests: schema, batch shape, and the
1:1 / 1:N mapInPandas plumbing (decode kernels are deterministic stubs)."""

from __future__ import annotations

import hashlib

import pytest

from delta_unity_duckdb_spark.operators.multimodal import (
    _decode_bytes,
    extract_features,
    make_fake_media,
    repartition_by_asset,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media(spark, n=24)


def test_feature_extraction_shape_and_determinism(spark, media):
    feats = extract_features(media)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 24  # 1:1 rows
    r = rows["a0000"]
    assert len(r["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in r["feature"])
    content = hashlib.sha256(b"asset-0").digest() * 4
    assert r["sha256"] == hashlib.sha256(content).hexdigest()
    assert r["n_bytes"] == len(content)
    # determinism: same plan re-executed → identical features
    again = {x["asset_id"]: x["feature"] for x in extract_features(media).collect()}
    assert again["a0000"] == r["feature"]


def test_decode_stub_raises_on_empty():
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"", "image")


def test_resize_only_images(spark, media):
    out = resize_images(media, 32, 32).collect()
    assert len(out) == 8  # every 3rd asset is an image
    assert all(bytes(r["content"]).startswith(b"RESIZED:32x32:") for r in out)


def test_frame_sampling_explodes_videos(spark, media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    by_asset: dict[str, int] = {}
    for r in rows:
        by_asset[r["asset_id"]] = by_asset.get(r["asset_id"], 0) + 1
    # only videos; frame count = duration // 1000
    assert set(by_asset) == {f"a{i:04d}" for i in range(24) if i % 3 == 2}
    assert by_asset["a0002"] == (3000 + 2 * 500) // 1000
    assert all(len(bytes(r["frame"])) > 0 for r in rows)


def test_repartition_spreads_assets(spark, media):
    parts = repartition_by_asset(media, 6)
    assert parts.rdd.getNumPartitions() == 6
    assert parts.count() == 24


def test_ingest_binary_dir_maps_to_media_schema(spark, tmp_path):
    from delta_unity_duckdb_spark.operators.multimodal import (
        ingest_binary_dir,
        extract_features,
    )

    (tmp_path / "cat.png").write_bytes(b"\x89PNG fake" * 8)
    (tmp_path / "talk.wav").write_bytes(b"RIFF fake" * 8)
    (tmp_path / "clip.mp4").write_bytes(b"\x00\x00ftyp fake" * 8)
    (tmp_path / "notes.txt").write_bytes(b"not media")

    media = ingest_binary_dir(spark, str(tmp_path))
    rows = {r.asset_id: r for r in media.collect()}
    assert rows["cat.png"].modality == "image"
    assert rows["cat.png"].meta.mime == "image/png"
    assert rows["talk.wav"].modality == "audio"
    assert rows["clip.mp4"].modality == "video"
    assert rows["notes.txt"].modality is None  # unknown kept, untyped
    assert bytes(rows["cat.png"].content) == b"\x89PNG fake" * 8

    # ingested rows flow straight into the feature stage
    feats = extract_features(media.filter("modality IS NOT NULL"))
    assert feats.count() == 3


def test_media_similarity_end_to_end(spark):
    """Ingest → features → k-NN: the retrieval-over-media pipeline shape.
    Features are deterministic fakes; the plumbing (schemas, array cols,
    broadcast knn) is the real thing."""
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators.multimodal import (
        extract_features,
        make_fake_media,
    )
    from delta_unity_duckdb_spark.operators.similarity import knn_join

    media = make_fake_media(spark, n=18)
    feats = extract_features(media)  # (asset_id, modality, feature, ...)
    emb = feats.select("asset_id", F.col("feature").alias("embedding"))
    q = emb.limit(2).select(
        F.col("asset_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = knn_join(
        emb.join(q.select(F.col("qid").alias("asset_id")), "asset_id", "left_anti"),
        q,
        k=3,
        id_col="asset_id",
    )
    rows = got.collect()
    assert len(rows) == 6  # 2 queries × 3 neighbors
    per_q = {r.qid for r in rows}
    assert len(per_q) == 2
    for r in rows:
        assert -1.0001 <= r.cosine_sim <= 1.0001


def test_write_media_fixture_dir_roundtrip(spark, tmp_path):
    """On-disk fixture → binaryFile ingest → BOTH real decode arms: the
    decoded per-asset features must equal the in-memory make_*_media
    twins' (same closed forms, bytes routed through disk + listing), and
    a second write call must be an idempotent no-op."""
    import os

    from delta_unity_duckdb_spark.operators.multimodal import (
        audio_features,
        image_features,
        ingest_binary_dir,
        jpeg_features,
        make_jpeg_media,
        make_png_media,
        make_wav_media,
        write_media_fixture_dir,
    )

    d = str(tmp_path / "assets")
    assert write_media_fixture_dir(d, n_wav=6, n_png=5, n_jpeg=4) == 15
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    assert write_media_fixture_dir(d, n_wav=6, n_png=5, n_jpeg=4) == 15
    assert mtimes == {  # idempotent
        f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
    }
    # 15 assets + the formula-version manifest ("_"-prefixed so Spark's
    # file listing skips it); no torn temp files.
    assert len(mtimes) == 16 and not any(f.endswith(".tmp") for f in mtimes)
    assert "_MANIFEST.txt" in mtimes
    # A manifest mismatch (formula change without a payload-length change)
    # must force regeneration — the size-only skip alone would keep stale
    # bytes silently.
    with open(os.path.join(d, "_MANIFEST.txt"), "w") as f:
        f.write("v0 some-older-formula\n")
    assert write_media_fixture_dir(d, n_wav=6, n_png=5, n_jpeg=4) == 15
    regen = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    assert all(regen[f] >= mtimes[f] for f in mtimes)
    assert regen["w0000.wav"] > mtimes["w0000.wav"]

    media = ingest_binary_dir(spark, d)
    got_a = {
        r["asset_id"].removesuffix(".wav"): (r["n_samples"], r["sum_sq"])
        for r in audio_features(media).collect()
    }
    want_a = {
        r["asset_id"]: (r["n_samples"], r["sum_sq"])
        for r in audio_features(make_wav_media(spark, 6)).collect()
    }
    assert got_a == want_a and len(got_a) == 6
    got_i = {
        r["asset_id"].removesuffix(".png"): (r["width"], r["pix_sum"])
        for r in image_features(media).collect()
    }
    want_i = {
        r["asset_id"]: (r["width"], r["pix_sum"])
        for r in image_features(make_png_media(spark, 5)).collect()
    }
    assert got_i == want_i and len(got_i) == 5
    # JPEG arm: route on the typed mime (the PNG kernel would quarantine
    # the .jpg payloads, hiding a routing bug as a silent drop).
    from pyspark.sql import functions as F

    got_j = {
        r["asset_id"].removesuffix(".jpg"): (r["width"], r["pix_sum"])
        for r in jpeg_features(
            media.filter(F.col("meta.mime") == "image/jpeg")
        ).collect()
    }
    want_j = {
        r["asset_id"]: (r["width"], r["pix_sum"])
        for r in jpeg_features(make_jpeg_media(spark, 4)).collect()
    }
    assert got_j == want_j and len(got_j) == 4


def test_write_media_fixture_dir_shrink_removes_stale_assets(tmp_path):
    """Shrinking a count (n_jpeg 4 → 0) changes the manifest, and the
    regeneration must DELETE the now-excess j*.jpg files — binaryFile
    ingest lists the directory, so stale assets would surface as an
    asset-count/value mismatch pointing at the decode path."""
    import os

    from delta_unity_duckdb_spark.operators.multimodal import (
        write_media_fixture_dir,
    )

    d = str(tmp_path / "assets")
    assert write_media_fixture_dir(d, n_wav=3, n_png=2, n_jpeg=4) == 9
    assert sum(f.endswith(".jpg") for f in os.listdir(d)) == 4
    assert write_media_fixture_dir(d, n_wav=3, n_png=2, n_jpeg=0) == 5
    names = sorted(f for f in os.listdir(d) if not f.startswith("_"))
    assert names == ["p0000.png", "p0001.png", "w0000.wav", "w0001.wav",
                     "w0002.wav"]
    # Growing back regenerates the jpegs and keeps the survivors.
    assert write_media_fixture_dir(d, n_wav=3, n_png=2, n_jpeg=1) == 6
    assert sum(f.endswith(".jpg") for f in os.listdir(d)) == 1


def test_media_scale_referee_matches_oracle_constants(spark):
    """The numpy referee in tools/bench_media_scale.py and the
    media_ingest_decode SQL oracle must agree at the registered fixture
    size — pins the two independent closed-form replays together."""
    import duckdb

    from delta_unity_duckdb_spark.workload.media import _INGEST_N
    from delta_unity_duckdb_spark.workload.registry import ORACLE
    from tools.bench_media_scale import referee

    exp = referee(_INGEST_N)
    rows = duckdb.connect().execute(ORACLE["media_ingest_decode"]).fetchall()
    got = {r[0]: tuple(int(x) for x in r[1:]) for r in rows}
    assert got == exp
