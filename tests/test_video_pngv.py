"""The real video-frame arm: motion-PNG container codec, sampling
cadence, per-frame decode referee, and quarantine semantics."""

from __future__ import annotations

import pytest

from delta_unity_duckdb_spark.operators.multimodal import (
    decode_png,
    decode_pngv,
    encode_png,
    encode_pngv,
    frame_features,
    make_pngv_media,
    sample_frames_pngv,
)


def _frame(v: int) -> bytes:
    return encode_png([[[v % 256] * 3 for _ in range(4)] for _ in range(3)], "rotate")


class TestContainer:
    def test_roundtrip(self):
        frames = [_frame(i) for i in range(5)]
        fps, got = decode_pngv(encode_pngv(frames, 7))
        assert fps == 7
        assert got == frames

    def test_malformed_is_loud(self):
        with pytest.raises(ValueError):
            decode_pngv(b"MP4\x00 not ours")
        good = encode_pngv([_frame(1)], 4)
        with pytest.raises(ValueError, match="truncated"):
            decode_pngv(good[:-3])
        with pytest.raises(ValueError, match="trailing"):
            decode_pngv(good + b"junk")


class TestSamplingAndDecode:
    def test_sampling_cadence_and_frame_decode(self, spark):
        frames = sample_frames_pngv(make_pngv_media(spark, 4), every_ms=500)
        rows = frames.collect()
        # 4 fps, 500ms sampling => even frame indices only
        by_asset: dict[str, list[int]] = {}
        for r in rows:
            by_asset.setdefault(r["asset_id"], []).append(r["frame_index"])
        for i in range(4):
            n_frames = 4 + (i % 3)
            want = [f for f in range(n_frames) if f % 2 == 0]
            assert sorted(by_asset[f"v{i:04d}"]) == want
        # every emitted frame payload is a real decodable PNG
        for r in rows:
            w, h, ch, _ = decode_png(bytes(r["frame"]))
            assert (w, h, ch) == (16, 12, 3)

    def test_frame_features_referee(self, spark):
        frames = sample_frames_pngv(make_pngv_media(spark, 3), every_ms=500)
        got = {
            (r["asset_id"], r["frame_index"]): r["pix_sum"]
            for r in frame_features(frames).collect()
        }
        for (aid, f), pix_sum in got.items():
            i = int(aid[1:])
            want = sum(
                (7 * x + 13 * y + 29 * c + 41 * f + 31 * i) % 256
                for y in range(12)
                for x in range(16)
                for c in range(3)
            )
            assert pix_sum == want

    def test_corrupt_container_quarantines(self, spark):
        from pyspark.sql import functions as F

        media = make_pngv_media(spark, 3)
        corrupt = media.withColumn(
            "content",
            F.when(
                F.col("asset_id") == "v0001",
                F.lit(bytearray(b"not a container")),
            ).otherwise(F.col("content")),
        )
        ids = {
            r["asset_id"]
            for r in sample_frames_pngv(corrupt, every_ms=500).collect()
        }
        assert ids == {"v0000", "v0002"}
