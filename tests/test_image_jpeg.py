"""The real baseline-JPEG image arm: codec correctness against a
HAND-CONSTRUCTED byte stream (markers + entropy bits assembled per
T.81 in the test — no shared code with the encoder, so a symmetric
encode/decode bug can't cancel), the DCT-basis-exact round-trip
contract, ZRL / byte-stuffing coverage, loud rejection of everything
non-baseline, and the mapInPandas feature pass vs a Python referee."""

from __future__ import annotations

import struct

import pytest

from delta_unity_duckdb_spark.operators.multimodal import (
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    decode_jpeg_gray,
    encode_jpeg_gray,
    jpeg_features,
    make_jpeg_media,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _headers(w: int = 8, h: int = 8) -> bytes:
    """SOI + DQT(uniform 16) + SOF0 + the two Annex K DHTs + SOS."""
    out = b"\xff\xd8"
    out += _seg(0xFFDB, bytes([0x00]) + bytes([16] * 64))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out


def _s4(t: int) -> int:
    return 1 if t % 8 in (0, 3, 4, 7) else -1


def _fixture_pixels(i: int) -> list[list[int]]:
    """The closed-form pattern make_jpeg_media encodes (re-derived here,
    not imported, so fixture drift is caught)."""
    w = 8 * (2 + (i % 3))
    h = 8 * (1 + (i % 2))
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            bx, by = x // 8, y // 8
            k_dc = ((bx + 2 * by + 3 * i) % 7) - 3
            k_a = ((bx + i) % 5) - 2
            k_b = ((by + 2 * i) % 5) - 2
            k_c = ((bx + by + i) % 3) - 1
            row.append(
                128 + 2 * (k_dc + k_a * _s4(x) + k_b * _s4(y)
                           + k_c * _s4(x) * _s4(y))
            )
        rows.append(row)
    return rows


class TestDecoder:
    def test_hand_constructed_dc_only_jpeg(self):
        """One 8x8 block, DC quantized level 1 (q=16 → dequant 16 → IDCT
        constant 16/8 = 2 → pixel 130). Entropy bits assembled by hand
        from the Annex K canonical codes: DC size-1 = 010, value bit 1,
        AC EOB = 1010 → 0b01011010 = 0x5A, exactly one byte."""
        content = _headers() + bytes([0x5A]) + b"\xff\xd9"
        w, h, px = decode_jpeg_gray(content)
        assert (w, h) == (8, 8)
        assert px == bytes([130] * 64)

    def test_missing_soi_refused(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg_gray(b"\x89PNG1234")

    def test_truncated_refused(self):
        content = _headers() + bytes([0x5A]) + b"\xff\xd9"
        with pytest.raises(ValueError):
            decode_jpeg_gray(content[:30])

    def test_progressive_sof_refused(self):
        # Same frame header but marker SOF2 (progressive).
        content = (
            b"\xff\xd8"
            + _seg(0xFFDB, bytes([0x00]) + bytes([16] * 64))
            + _seg(0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        )
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg_gray(content + b"\xff\xd9")

    def test_truncated_dqt_refused(self):
        # A DQT segment whose declared length cuts the 64-entry table
        # short must fail loudly — zero-filling the missing qmat cells
        # would decode to silently wrong pixels that still emit a
        # valid-looking feature row.
        content = (
            b"\xff\xd8"
            + _seg(0xFFDB, bytes([0x00]) + bytes([16] * 40))  # only 40 of 64
            + _seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        )
        with pytest.raises(ValueError, match="truncated DQT"):
            decode_jpeg_gray(content + b"\xff\xd9")

    def test_restart_interval_refused(self):
        content = b"\xff\xd8" + _seg(0xFFDD, struct.pack(">H", 4))
        with pytest.raises(ValueError, match="restart"):
            decode_jpeg_gray(content)

    def test_multi_component_refused(self):
        sof = struct.pack(">BHHB", 8, 8, 8, 3) + bytes(
            [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
        )
        content = b"\xff\xd8" + _seg(0xFFC0, sof)
        with pytest.raises(ValueError, match="grayscale"):
            decode_jpeg_gray(content + b"\xff\xd9")

    def test_marker_inside_scan_refused(self):
        # An unstuffed RST0 marker inside the entropy stream is loud.
        content = _headers() + bytes([0x5A]) + b"\xff\xd0" + bytes([0x5A]) + b"\xff\xd9"
        with pytest.raises(ValueError, match="marker inside scan"):
            decode_jpeg_gray(content)

    def test_corrupt_entropy_refused(self):
        # All-zero entropy bits decode DC size 0... craft an invalid
        # huffman walk instead: 17 one-bits never match a DC code.
        content = _headers() + bytes([0xFF, 0x00, 0xFF, 0x00, 0xFF, 0x00]) + b"\xff\xd9"
        with pytest.raises(ValueError, match="invalid huffman|truncated"):
            decode_jpeg_gray(content)


class TestRoundTrip:
    def test_fixture_family_bit_exact(self):
        """The DCT-basis-exact contract: every fixture pattern survives
        the LOSSY encode→decode bit-exactly (coefficients only at
        (0,0)/(0,4)/(4,0)/(4,4), multiples of the quant step)."""
        for i in range(16):
            px = _fixture_pixels(i)
            w, h, out = decode_jpeg_gray(encode_jpeg_gray(px))
            assert (w, h) == (len(px[0]), len(px))
            assert out == bytes(v for row in px for v in row), f"asset {i}"

    def test_zrl_path(self):
        """Only the (4,4) coefficient (zigzag 24) → a 23-zero run → the
        encoder must emit ZRL and the decoder must skip 16+7 zeros."""
        px = [[128 + 2 * _s4(x) * _s4(y) for x in range(8)] for y in range(8)]
        w, h, out = decode_jpeg_gray(encode_jpeg_gray(px))
        assert out == bytes(v for row in px for v in row)

    def test_byte_stuffing_occurs_and_roundtrips(self):
        """At least one corpus asset's entropy stream contains a stuffed
        0xFF00 — and it still decodes bit-exactly (covered above); this
        pins that the stuffing path is genuinely exercised."""
        stuffed = 0
        for i in range(16):
            content = encode_jpeg_gray(_fixture_pixels(i))
            sos = content.find(b"\xff\xda")
            if b"\xff\x00" in content[sos:-2]:
                stuffed += 1
        assert stuffed >= 8  # 11 of 16 by construction

    def test_dc_prediction_across_blocks(self):
        """Blocks with different constant values force nonzero DC diffs
        both directions."""
        px = [[112 if x < 8 else (144 if x < 16 else 128) for x in range(24)]
              for y in range(8)]
        w, h, out = decode_jpeg_gray(encode_jpeg_gray(px))
        assert out == bytes(v for row in px for v in row)

    def test_encoder_refuses_ragged_dims(self):
        with pytest.raises(ValueError, match="multiple-of-8"):
            encode_jpeg_gray([[128] * 12 for _ in range(8)])


class TestFeaturePass:
    def test_features_match_python_referee(self, spark):
        media = make_jpeg_media(spark, 16)
        got = {
            r["asset_id"]: r.asDict()
            for r in jpeg_features(media).collect()
        }
        assert len(got) == 16
        for i in range(16):
            px = _fixture_pixels(i)
            flat = [v for row in px for v in row]
            w, h = len(px[0]), len(px)
            r = got[f"j{i:04d}"]
            assert r["width"] == w and r["height"] == h
            assert r["channels"] == 1
            assert r["pix_sum"] == sum(flat)
            assert r["pix_min"] == min(flat)
            assert r["pix_max"] == max(flat)
            assert r["mean_milli"] == sum(flat) * 1000 // (w * h)

    def test_corrupt_asset_quarantines_not_aborts(self, spark):
        from pyspark.sql import functions as F

        media = make_jpeg_media(spark, 4)
        corrupt = media.withColumn(
            "content",
            F.when(F.col("asset_id") == "j0001",
                   F.lit(bytearray(b"\xff\xd8garbage"))).otherwise(
                F.col("content")),
        )
        ids = [r["asset_id"] for r in jpeg_features(corrupt).collect()]
        assert sorted(ids) == ["j0000", "j0002", "j0003"]
