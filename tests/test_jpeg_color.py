"""The color-JPEG arm: interleaved-MCU baseline YCbCr decode proved
bit-exact against the closed-form referee for BOTH subsamplings, loud
rejection of everything outside the 4:2:0 / 4:4:4 baseline contract,
codec-routing between the grayscale and color arms in a mixed
directory, and the mapInPandas feature pass vs the Python referee."""

from __future__ import annotations

import struct

import pytest

from delta_unity_duckdb_spark.operators.jpeg_color import (
    build_color_asset,
    color_asset_dims,
    color_plane_value,
    decode_jpeg_color,
    encode_jpeg_color,
    expected_rgb,
    jpeg_color_features,
    make_jpeg_color_media,
)
from delta_unity_duckdb_spark.operators.multimodal import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


class TestRoundTrip:
    def test_fixture_family_bit_exact_both_subsamplings(self):
        """Every fixture asset decodes to EXACTLY the closed-form RGB —
        the DCT-basis exactness contract extended per plane. Covers
        4:2:0 (even i) and 4:4:4 (odd i), two widths each."""
        subs = set()
        for i in range(12):
            w, h, sub, rgb = decode_jpeg_color(build_color_asset(i))
            assert (w, h, sub) == color_asset_dims(i)
            subs.add(sub)
            for y in range(h):
                for x in range(w):
                    off = (y * w + x) * 3
                    assert tuple(rgb[off : off + 3]) == expected_rgb(i, x, y), (
                        f"asset {i} pixel ({x},{y})"
                    )
        assert subs == {"420", "444"}

    def test_chroma_upsampling_is_2x2_replication(self):
        """At 4:2:0 the four full-res pixels sharing a chroma sample must
        get identical chroma contributions: with a FLAT luma plane their
        RGB values are identical within each 2x2 cell."""
        w, h = 16, 16
        y = [[128] * w for _ in range(h)]
        # chroma planes varying per sample so adjacent cells differ
        cb = [[120 + 2 * ((cx + cy) % 5) for cx in range(8)] for cy in range(8)]
        cr = [[126 + 2 * (cx % 3) for cx in range(8)] for cy in range(8)]
        # quantization is lossy for this non-basis pattern — decode the
        # bytes and compare structure, not exact values
        _, _, sub, rgb = decode_jpeg_color(encode_jpeg_color(y, cb, cr, "420"))
        assert sub == "420"
        px = [
            [tuple(rgb[(yy * w + xx) * 3 : (yy * w + xx) * 3 + 3]) for xx in range(w)]
            for yy in range(h)
        ]
        for cy in range(h // 2):
            for cx in range(w // 2):
                cell = {
                    px[2 * cy][2 * cx], px[2 * cy][2 * cx + 1],
                    px[2 * cy + 1][2 * cx], px[2 * cy + 1][2 * cx + 1],
                }
                assert len(cell) == 1, f"cell ({cx},{cy}) not replicated"

    def test_component_routing_not_symmetric(self):
        """Cb and Cr must route to their own positions: swapping the
        fixture's Cb/Cr planes changes the decoded RGB (a swap bug could
        not hide behind symmetric formulas)."""
        i = 2
        w, h, sub = color_asset_dims(i)
        cw, chh = (w // 2, h // 2) if sub == "420" else (w, h)
        y = [[color_plane_value("y", i, x, yy) for x in range(w)] for yy in range(h)]
        cb = [[color_plane_value("cb", i, x, yy) for x in range(cw)] for yy in range(chh)]
        cr = [[color_plane_value("cr", i, x, yy) for x in range(cw)] for yy in range(chh)]
        straight = decode_jpeg_color(encode_jpeg_color(y, cb, cr, sub))[3]
        swapped = decode_jpeg_color(encode_jpeg_color(y, cr, cb, sub))[3]
        assert straight != swapped

    def test_byte_stuffing_occurs_and_roundtrips(self):
        """The 12-asset family must actually exercise 0xFF00 stuffing
        somewhere (otherwise the unstuffing path is dead code in the
        fixture's eyes)."""
        stuffed = 0
        for i in range(12):
            content = build_color_asset(i)
            sos = content.index(b"\xff\xda")
            stuffed += content[sos:].count(b"\xff\x00")
        assert stuffed > 0


class TestRefusals:
    def test_grayscale_file_refused_by_color_arm(self):
        gray = encode_jpeg_gray([[128] * 16 for _ in range(8)])
        with pytest.raises(ValueError, match="3-component|grayscale"):
            decode_jpeg_color(gray)

    def test_color_file_refused_by_gray_arm(self):
        with pytest.raises(ValueError, match="grayscale"):
            decode_jpeg_gray(build_color_asset(0))

    def test_unsupported_sampling_refused(self):
        """4:2:2 (Y 2x1) is outside the contract — loud, not wrong."""
        content = build_color_asset(0)
        sof = content.index(b"\xff\xc0")
        mut = bytearray(content)
        # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1), comp0 at +10;
        # sampling byte at +11 relative to the 0xFFC0 marker start
        assert mut[sof + 11] == 0x22
        mut[sof + 11] = 0x21
        with pytest.raises(ValueError, match="sampling"):
            decode_jpeg_color(bytes(mut))

    def test_two_component_scan_refused(self):
        content = build_color_asset(1)  # 4:4:4
        sof = content.index(b"\xff\xc0")
        mut = bytearray(content)
        assert mut[sof + 9] == 3  # nc byte
        mut[sof + 9] = 2
        with pytest.raises(ValueError, match="3-component|malformed"):
            decode_jpeg_color(bytes(mut))

    def test_encoder_refuses_bad_dims_and_planes(self):
        with pytest.raises(ValueError, match="multiples of 16"):
            encode_jpeg_color([[128] * 8 for _ in range(8)],
                              [[128] * 4 for _ in range(4)],
                              [[128] * 4 for _ in range(4)], "420")
        with pytest.raises(ValueError, match="chroma plane dims"):
            encode_jpeg_color([[128] * 16 for _ in range(16)],
                              [[128] * 16 for _ in range(16)],
                              [[128] * 16 for _ in range(16)], "420")
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg_color([[128] * 8 for _ in range(8)],
                              [[128] * 8 for _ in range(8)],
                              [[128] * 8 for _ in range(8)], "422")


class TestSparkKernel:
    def test_features_match_python_referee(self, spark):
        got = {
            r["asset_id"]: r
            for r in jpeg_color_features(make_jpeg_color_media(spark, 12)).collect()
        }
        assert len(got) == 12
        for i in range(12):
            w, h, sub = color_asset_dims(i)
            rs = gs = bs = 0
            mn, mx = 255, 0
            for y in range(h):
                for x in range(w):
                    r, g, b = expected_rgb(i, x, y)
                    rs, gs, bs = rs + r, gs + g, bs + b
                    mn = min(mn, r, g, b)
                    mx = max(mx, r, g, b)
            row = got[f"jc{i:04d}"]
            assert (row["width"], row["height"], row["channels"]) == (w, h, 3)
            assert row["subsampling"] == sub
            assert (row["r_sum"], row["g_sum"], row["b_sum"]) == (rs, gs, bs)
            assert (row["rgb_min"], row["rgb_max"]) == (mn, mx)

    def test_mixed_directory_routes_by_codec_contract(self, spark, tmp_path):
        """A directory holding grayscale AND color jpegs: each arm's
        kernel decodes its own files and quarantines the other's — the
        routing is the decode contract itself, no filename logic."""
        import os

        from delta_unity_duckdb_spark.operators.jpeg_color import (
            build_color_asset,
        )
        from delta_unity_duckdb_spark.operators.multimodal import (
            ingest_binary_dir,
            jpeg_features,
            write_media_fixture_dir,
        )

        d = str(tmp_path / "assets")
        write_media_fixture_dir(d, n_wav=0, n_png=0, n_jpeg=3, n_jpeg_color=4)
        assert sum(f.startswith("jc") for f in os.listdir(d)) == 4
        media = ingest_binary_dir(spark, d)
        gray = jpeg_features(media).collect()
        color = jpeg_color_features(media).collect()
        assert sorted(r["asset_id"] for r in gray) == [
            f"j{i:04d}.jpg" for i in range(3)
        ]
        assert sorted(r["asset_id"] for r in color) == [
            f"jc{i:04d}.jpg" for i in range(4)
        ]
        for r in color:
            i = int(r["asset_id"][2:6])
            w, h, sub = color_asset_dims(i)
            assert (r["width"], r["height"], r["subsampling"]) == (w, h, sub)
