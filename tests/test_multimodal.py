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
