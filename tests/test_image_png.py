"""The real multimodal image arm: PNG codec correctness against a
HAND-CONSTRUCTED byte stream (built per spec in the test with raw zlib +
explicit filter bytes — no shared code with the encoder, so a symmetric
encode/decode bug can't cancel), filter coverage, CRC loudness, and the
feature pass referee."""

from __future__ import annotations

import struct
import zlib

import pytest

from delta_unity_duckdb_spark.operators.multimodal import (
    decode_png,
    encode_png,
    image_features,
    make_png_media,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


_SIG = b"\x89PNG\r\n\x1a\n"


class TestDecoder:
    def test_hand_constructed_png(self):
        """2x2 RGB built per spec by hand: row 0 filter 0 (none) with
        pixels (255,0,0)(0,255,0); row 1 filter 2 (up) encoding
        (0,0,255)(255,255,255) as deltas against row 0."""
        row0 = bytes([255, 0, 0, 0, 255, 0])
        want1 = bytes([0, 0, 255, 255, 255, 255])
        row1_up = bytes((want1[i] - row0[i]) & 0xFF for i in range(6))
        raw = b"\x00" + row0 + b"\x02" + row1_up
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        png = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        w, h, ch, px = decode_png(png)
        assert (w, h, ch) == (2, 2, 3)
        assert px == row0 + want1

    def test_roundtrip_all_filters_gray_rgb_rgba(self):
        for nch in (1, 3, 4):
            pixels = [
                [
                    [(5 * x + 11 * y + 17 * c) % 256 for c in range(nch)]
                    for x in range(13)
                ]
                for y in range(7)  # 7 rows -> filters 0..4 plus repeats
            ]
            want = bytes(v for row in pixels for p in row for v in p)
            assert decode_png(encode_png(pixels, "rotate"))[3] == want
            assert decode_png(encode_png(pixels, "none"))[3] == want

    def test_crc_corruption_is_loud(self):
        png = bytearray(encode_png([[[1, 2, 3]]], "none"))
        png[-5] ^= 0xFF  # flip a bit inside IEND's CRC
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(png))

    def test_unsupported_shapes_refused(self):
        with pytest.raises(ValueError):
            decode_png(b"JFIF not a png")
        # 16-bit depth must refuse, not mis-decode
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        png = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(png)

    def test_zero_dimension_refused(self):
        # A 0x0 (or 0xN) PNG decodes to an empty pixel buffer, which the
        # feature kernels can't quarantine (min() on empty / div-by-zero
        # happen outside their try) — the decoder must drop it instead.
        for w, h in ((0, 0), (0, 3), (3, 0)):
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            png = (
                _SIG
                + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(b"\x00" * h))
                + _chunk(b"IEND", b"")
            )
            with pytest.raises(ValueError, match="unsupported"):
                decode_png(png)

    def test_kernel_quarantines_zero_dim_png(self, spark):
        from pyspark.sql import functions as F

        media = make_png_media(spark, 3)
        ihdr = struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0)
        bad = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b""))
            + _chunk(b"IEND", b"")
        )
        corrupt = media.withColumn(
            "content",
            F.when(
                F.col("asset_id") == "p0001", F.lit(bytearray(bad))
            ).otherwise(F.col("content")),
        )
        ids = [r["asset_id"] for r in image_features(corrupt).collect()]
        assert sorted(ids) == ["p0000", "p0002"]


class TestImageFeaturesPass:
    def test_features_match_python_referee(self, spark):
        got = {
            r["asset_id"]: r.asDict()
            for r in image_features(make_png_media(spark, 6)).collect()
        }
        assert len(got) == 6
        for i in range(6):
            w, h = 32 + 8 * (i % 5), 24 + 8 * (i % 3)
            vals = [
                (7 * x + 13 * y + 29 * c + 31 * i) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            ]
            r = got[f"p{i:04d}"]
            assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
            assert r["pix_sum"] == sum(vals)
            assert r["pix_min"] == min(vals)
            assert r["pix_max"] == max(vals)
            assert r["mean_milli"] == sum(vals) * 1000 // (w * h * 3)

    def test_corrupt_asset_quarantines_not_aborts(self, spark):
        from pyspark.sql import functions as F

        media = make_png_media(spark, 3)
        corrupt = media.withColumn(
            "content",
            F.when(
                F.col("asset_id") == "p0001",
                F.lit(bytearray(b"garbage-not-png")),
            ).otherwise(F.col("content")),
        )
        ids = [r["asset_id"] for r in image_features(corrupt).collect()]
        assert sorted(ids) == ["p0000", "p0002"]


class TestResize:
    def test_resize_pixels_match_nn_referee(self, spark):
        from delta_unity_duckdb_spark.operators.multimodal import (
            resize_png_images,
        )

        media = make_png_media(spark, 4)
        out = {
            r["asset_id"]: bytes(r["content"])
            for r in resize_png_images(media, 16, 12).collect()
        }
        assert len(out) == 4
        for i in range(4):
            sw, sh = 32 + 8 * (i % 5), 24 + 8 * (i % 3)
            w, h, ch, px = decode_png(out[f"p{i:04d}"])
            assert (w, h, ch) == (16, 12, 3)
            for y in range(12):
                for x in range(16):
                    for c in range(3):
                        want = (
                            7 * (x * sw // 16)
                            + 13 * (y * sh // 12)
                            + 29 * c
                            + 31 * i
                        ) % 256
                        assert px[(y * 16 + x) * 3 + c] == want

    def test_resized_meta_updated(self, spark):
        from delta_unity_duckdb_spark.operators.multimodal import (
            resize_png_images,
        )

        media = make_png_media(spark, 2)
        for r in resize_png_images(media, 16, 12).collect():
            assert (r["meta"]["width"], r["meta"]["height"]) == (16, 12)


class TestPixelDedup:
    def test_groups_require_decoding_both_encodings(self, spark):
        from delta_unity_duckdb_spark.operators.multimodal import (
            image_pixel_dedup,
            make_png_media_mixed_encodings,
        )

        media = make_png_media_mixed_encodings(spark, 16)
        # byte payloads are all distinct...
        payloads = {bytes(r["content"]) for r in media.collect()}
        assert len(payloads) == 16
        # ...but pixel dedup must find 8 groups of 2, each spanning
        # 2 byte variants, with the rotate-encoded copy as survivor
        rows = image_pixel_dedup(media).collect()
        assert len(rows) == 8
        for r in rows:
            assert r["n_assets"] == 2
            assert r["n_byte_variants"] == 2
            assert int(r["survivor"][1:]) < 8


class TestPerceptualDhash:
    def test_pairs_found_despite_pixel_and_byte_differences(self, spark):
        from delta_unity_duckdb_spark.operators.multimodal import (
            decode_png,
            image_dhash_groups,
            make_png_media_perceptual,
        )

        media = make_png_media_perceptual(spark, 16)
        rows = media.collect()
        # all byte payloads distinct AND all pixel buffers distinct —
        # exact and content-defined dedup both keep 16 items
        assert len({bytes(r["content"]) for r in rows}) == 16
        assert len({decode_png(bytes(r["content"]))[3] for r in rows}) == 16
        groups = image_dhash_groups(media).collect()
        assert len(groups) == 8
        for g in groups:
            assert g["n_assets"] == 2
            assert len(g["dhash"]) == 64
            assert set(g["dhash"]) <= {"0", "1"}
            assert int(g["survivor"][1:]) < 8  # lower variant survives


class TestMalformedBeyondValueError:
    def test_corrupt_deflate_is_valueerror(self):
        """Valid CRCs, garbage zlib stream — zlib.error must surface as
        ValueError so the kernels quarantine instead of aborting."""
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        png = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", b"this is not deflate")
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(png)

    def test_truncated_chunk_header_is_valueerror(self):
        good = encode_png([[[1, 2, 3]]], "none")
        # keep the signature plus a dangling half chunk-header: the CRC
        # read runs past the buffer (struct.error path)
        bad = good[:14] + b"\x00"
        with pytest.raises(ValueError):
            decode_png(bad)

    def test_kernel_quarantines_corrupt_deflate(self, spark):
        from pyspark.sql import functions as F

        from delta_unity_duckdb_spark.operators.multimodal import (
            image_features,
        )

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        bad = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", b"junk")
            + _chunk(b"IEND", b"")
        )
        media = make_png_media(spark, 3)
        corrupt = media.withColumn(
            "content",
            F.when(F.col("asset_id") == "p0001", F.lit(bytearray(bad))).otherwise(
                F.col("content")
            ),
        )
        ids = [r["asset_id"] for r in image_features(corrupt).collect()]
        assert sorted(ids) == ["p0000", "p0002"]
