"""Baseline COLOR JPEG (ITU T.81, YCbCr, 4:2:0 and 4:4:4) in pure
stdlib + numpy — the chroma-subsampled arm round 6 left gated "on absent
libjpeg". No external codec is needed: this extends the from-scratch
grayscale codec (operators/multimodal.py) with interleaved-MCU scan
decode, per-component quant/huffman table routing, per-component DC
prediction, 2x2 chroma upsampling, and fixed-point YCbCr->RGB.

Reference parity: the reference pipeline treats images as opaque binary
columns decoded by a local codec (npiesco/delta-unity-duckdb delegates to
its host runtime); this repo implements the codec itself so the
binaryFile -> decode -> features path is real end-to-end.

Exactness contract (how a LOSSY codec stays oracle-checkable) — the same
DCT-basis trick as the grayscale arm, applied per PLANE: fixture Y/Cb/Cr
planes are synthesized from DCT coefficients only at (0,0), (0,4),
(4,0), (4,4), whose IDCT contribution is the exact rational ±F/8, with
coefficient levels that are multiples of the quant step — so
encode -> decode reproduces every plane bit-exactly. RGB conversion is
then a DEFINED deterministic function (libjpeg's 16-bit fixed-point
constants with floor shift):

    r = clamp(y + (91881*(cr-128) + 32768 >> 16))
    g = clamp(y - (22554*(cb-128) + 46802*(cr-128) + 32768 >> 16))
    b = clamp(y + (116130*(cb-128) + 32768 >> 16))

which a SQL oracle replays with FLOOR(x / 65536.0) (numerators < 2^25,
exact in doubles). 4:2:0 chroma upsampling is pixel replication
(cb_full(x, y) = cb(x//2, y//2)) — also closed-form-replayable.

Every kernel ships BY VALUE: factories evaluate the shared table/basis
helpers at driver time and close over plain lists/dicts (the round-6
cluster sim proved module-referencing closures die on PYTHONPATH-less
executors).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

from delta_unity_duckdb_spark.operators.multimodal import (
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    _JPEG_QSTEP,
    _jpeg_common,
)

# Annex K (T.81 Tables K.4 / K.6) chrominance huffman specs. Spec
# constants from the published standard (like the luminance pair in
# multimodal.py); the decoder never assumes them — it builds tables from
# the file's own DHT segments — so these are the ENCODER's choice.
_JPEG_C_DC_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_C_DC_VALS = list(range(12))
_JPEG_C_AC_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_JPEG_C_AC_VALS = (
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA]
)

# Fixed-point YCbCr->RGB (libjpeg jdcolor.c constants, FIX(x) = x*65536).
_FIX_CR_R = 91881     # 1.40200
_FIX_CB_G = 22554     # 0.34414
_FIX_CR_G = 46802     # 0.71414
_FIX_CB_B = 116130    # 1.77200

COLOR_FEATURES_SCHEMA = (
    "asset_id string, width long, height long, channels long, "
    "subsampling string, r_sum long, g_sum long, b_sum long, "
    "rgb_min long, rgb_max long"
)


def _make_jpeg_color_encoder():
    """-> encode(y, cb, cr, subsampling) -> baseline YCbCr JPEG bytes.

    ``y`` is a row-major list of rows (full resolution); ``cb``/``cr``
    are at chroma resolution (half each dimension for "420", full for
    "444"). Dims: multiples of 16 for 4:2:0, of 8 for 4:4:4."""
    luma_dc = (list(_JPEG_DC_BITS), list(_JPEG_DC_VALS))
    luma_ac = (list(_JPEG_AC_BITS), list(_JPEG_AC_VALS))
    chro_dc = (list(_JPEG_C_DC_BITS), list(_JPEG_C_DC_VALS))
    chro_ac = (list(_JPEG_C_AC_BITS), list(_JPEG_C_AC_VALS))
    qstep = _JPEG_QSTEP
    zigzag_order, dct_matrix, huff_codes = _jpeg_common()
    zz = zigzag_order()
    basis = dct_matrix()
    codes = {
        0: (huff_codes(*luma_dc), huff_codes(*luma_ac)),
        1: (huff_codes(*chro_dc), huff_codes(*chro_ac)),
    }

    def encode(y, cb, cr, subsampling="420"):
        import struct

        import numpy as np

        if subsampling not in ("420", "444"):
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        h, w = len(y), len(y[0])
        mcu = 16 if subsampling == "420" else 8
        if h % mcu or w % mcu:
            raise ValueError(
                f"dims must be multiples of {mcu} for {subsampling}"
            )
        ch, cw = (h // 2, w // 2) if subsampling == "420" else (h, w)
        if len(cb) != ch or len(cb[0]) != cw or len(cr) != ch or len(cr[0]) != cw:
            raise ValueError("chroma plane dims do not match subsampling")

        M = np.array(basis)
        planes = {
            0: np.array(y, dtype=np.float64) - 128.0,
            1: np.array(cb, dtype=np.float64) - 128.0,
            2: np.array(cr, dtype=np.float64) - 128.0,
        }

        entropy = bytearray()
        bitbuf, nbits = 0, 0

        def put_bits(code, ln):
            nonlocal bitbuf, nbits
            bitbuf = (bitbuf << ln) | (code & ((1 << ln) - 1))
            nbits += ln
            while nbits >= 8:
                byte = (bitbuf >> (nbits - 8)) & 0xFF
                entropy.append(byte)
                if byte == 0xFF:
                    entropy.append(0x00)  # byte stuffing
                nbits -= 8
            bitbuf &= (1 << nbits) - 1

        def category(v):
            return v.bit_length() if v > 0 else (-v).bit_length()

        def put_value(v, size):
            if size:
                put_bits(v if v >= 0 else v + (1 << size) - 1, size)

        preds = [0, 0, 0]

        def encode_block(comp, tbl, bx, by):
            blk = planes[comp][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coeff = M @ blk @ M.T
            quant = np.sign(coeff) * np.floor(np.abs(coeff) / qstep + 0.5)
            flat = [int(quant.flat[i]) for i in zz]
            dc_codes, ac_codes = codes[tbl]
            diff = flat[0] - preds[comp]
            preds[comp] = flat[0]
            s = category(diff)
            put_bits(*dc_codes[s])
            put_value(diff, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if flat[i]), default=0)
            for i in range(1, last_nz + 1):
                if flat[i] == 0:
                    run += 1
                    continue
                while run >= 16:
                    put_bits(*ac_codes[0xF0])  # ZRL
                    run -= 16
                s = category(flat[i])
                put_bits(*ac_codes[(run << 4) | s])
                put_value(flat[i], s)
                run = 0
            if last_nz < 63:
                put_bits(*ac_codes[0x00])  # EOB

        # Interleaved MCU order (T.81 A.2.3): within an MCU each
        # component's blocks run left-to-right, top-to-bottom.
        if subsampling == "420":
            for my in range(h // 16):
                for mx in range(w // 16):
                    for dy in range(2):
                        for dx in range(2):
                            encode_block(0, 0, mx * 2 + dx, my * 2 + dy)
                    encode_block(1, 1, mx, my)
                    encode_block(2, 1, mx, my)
        else:
            for my in range(h // 8):
                for mx in range(w // 8):
                    encode_block(0, 0, mx, my)
                    encode_block(1, 1, mx, my)
                    encode_block(2, 1, mx, my)
        if nbits:
            put_bits((1 << (8 - nbits)) - 1, 8 - nbits)  # pad with 1s

        def seg(marker, payload):
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        q = np.full(64, qstep, dtype=np.int32)
        qz = bytes(int(q[i]) for i in zz)
        samp_y = 0x22 if subsampling == "420" else 0x11
        out = bytearray(b"\xff\xd8")  # SOI
        out += seg(0xFFDB, bytes([0x00]) + qz)  # DQT table 0 (luma)
        out += seg(0xFFDB, bytes([0x01]) + qz)  # DQT table 1 (chroma)
        out += seg(  # SOF0: 8-bit, 3 components
            0xFFC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        out += seg(0xFFC4, bytes([0x00]) + bytes(luma_dc[0]) + bytes(luma_dc[1]))
        out += seg(0xFFC4, bytes([0x10]) + bytes(luma_ac[0]) + bytes(luma_ac[1]))
        out += seg(0xFFC4, bytes([0x01]) + bytes(chro_dc[0]) + bytes(chro_dc[1]))
        out += seg(0xFFC4, bytes([0x11]) + bytes(chro_ac[0]) + bytes(chro_ac[1]))
        out += seg(  # SOS: 3 components, (td, ta) = (0,0) (1,1) (1,1)
            0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        )
        out += entropy
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    return encode


def _make_jpeg_color_decoder():
    """-> decode(content) -> (width, height, subsampling, rgb bytes
    row-major interleaved RGB). Baseline sequential 3-component YCbCr
    with 4:2:0 or 4:4:4 sampling; everything else — including grayscale,
    which has its own arm — raises ValueError loudly."""
    zigzag_order, dct_matrix, _ = _jpeg_common()
    zz = zigzag_order()
    basis = dct_matrix()
    fix_cr_r, fix_cb_g, fix_cr_g, fix_cb_b = (
        _FIX_CR_R, _FIX_CB_G, _FIX_CR_G, _FIX_CB_B,
    )

    def decode(content: bytes):
        import struct

        import numpy as np

        def huff_codes(bits, vals):
            codes, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    codes[vals[k]] = (code, ln)
                    code += 1
                    k += 1
                code <<= 1
            return codes

        if content[:2] != b"\xff\xd8":
            raise ValueError("missing SOI marker")
        qtables: dict[int, list[int]] = {}
        hspecs: dict[tuple[int, int], dict] = {}
        sof = None
        scan_off = None
        scan_tabs = None
        pos = 2
        try:
            while pos + 4 <= len(content):
                if content[pos] != 0xFF:
                    raise ValueError(f"marker sync lost at {pos}")
                marker = content[pos + 1]
                if marker == 0xD9:
                    break
                (ln,) = struct.unpack_from(">H", content, pos + 2)
                data = content[pos + 4 : pos + 2 + ln]
                if marker == 0xDB:  # DQT (possibly several tables)
                    d = 0
                    while d < len(data):
                        pq, tq = data[d] >> 4, data[d] & 0x0F
                        if pq != 0:
                            raise ValueError("16-bit quant tables unsupported")
                        if len(data) - d < 65:
                            raise ValueError("truncated DQT")
                        qtables[tq] = list(data[d + 1 : d + 65])
                        d += 65
                elif marker == 0xC0:  # SOF0 baseline
                    prec, hh, ww, nc = struct.unpack_from(">BHHB", data, 0)
                    if prec != 8 or nc != 3:
                        raise ValueError(
                            f"unsupported SOF0 shape: prec={prec} "
                            f"ncomp={nc} (color arm is 3-component "
                            "YCbCr; grayscale has its own arm)"
                        )
                    comps = []
                    for c in range(3):  # per-component triples from byte 6
                        cid, samp, tq = data[6 + 3 * c : 9 + 3 * c]
                        comps.append((cid, samp >> 4, samp & 0x0F, tq))
                    samps = [(hs, vs) for _, hs, vs, _ in comps]
                    if samps == [(2, 2), (1, 1), (1, 1)]:
                        subsampling = "420"
                    elif samps == [(1, 1), (1, 1), (1, 1)]:
                        subsampling = "444"
                    else:
                        raise ValueError(
                            f"unsupported sampling factors {samps} "
                            "(4:2:0 and 4:4:4 only)"
                        )
                    sof = (ww, hh, comps, subsampling)
                elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                    raise ValueError(
                        f"non-baseline SOF marker 0xFF{marker:02X} unsupported"
                    )
                elif marker == 0xC4:  # DHT (possibly several tables)
                    d = 0
                    while d < len(data):
                        tc, th = data[d] >> 4, data[d] & 0x0F
                        bits = list(data[d + 1 : d + 17])
                        nv = sum(bits)
                        vals = list(data[d + 17 : d + 17 + nv])
                        if len(vals) != nv:
                            raise ValueError("truncated DHT")
                        hspecs[(tc, th)] = huff_codes(bits, vals)
                        d += 17 + nv
                elif marker == 0xDD:
                    raise ValueError("restart intervals unsupported")
                elif marker == 0xDA:  # SOS
                    ns = data[0]
                    if ns != 3:
                        raise ValueError(
                            f"expected 3-component scan, got {ns}"
                        )
                    tabs = []
                    for c in range(3):
                        _cid, tt = data[1 + 2 * c : 3 + 2 * c]
                        tabs.append((tt >> 4, tt & 0x0F))
                    scan_off = pos + 2 + ln
                    scan_tabs = tabs
                    break
                pos += 2 + ln
        except (struct.error, IndexError) as exc:
            raise ValueError(f"malformed JPEG: {exc}") from exc
        if sof is None or scan_off is None:
            raise ValueError("missing SOF0/SOS")
        w, h, comps, subsampling = sof
        mcu = 16 if subsampling == "420" else 8
        if w == 0 or h == 0 or w % mcu or h % mcu:
            raise ValueError(
                f"unsupported JPEG dims {w}x{h} for {subsampling}"
            )
        qmats = []
        luts = []
        for c in range(3):
            tq = comps[c][3]
            if tq not in qtables:
                raise ValueError("SOF references missing quant table")
            qm = np.zeros(64)
            for i, qi in enumerate(qtables[tq]):
                qm[zz[i]] = qi
            qmats.append(qm.reshape(8, 8))
            td, ta = scan_tabs[c]
            dc_map = hspecs.get((0, td))
            ac_map = hspecs.get((1, ta))
            if dc_map is None or ac_map is None:
                raise ValueError("SOS references missing huffman table")
            luts.append((
                {(ln, cd): s for s, (cd, ln) in dc_map.items()},
                {(ln, cd): s for s, (cd, ln) in ac_map.items()},
            ))
        M = np.array(basis)

        # Unstuff the entropy stream (0xFF00 -> 0xFF); any other marker
        # inside the scan is a loud error.
        data = content[scan_off:]
        unstuffed = bytearray()
        i = 0
        while i < len(data):
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < len(data) else None
                if nxt == 0x00:
                    unstuffed.append(0xFF)
                    i += 2
                    continue
                if nxt == 0xD9:
                    break
                raise ValueError(
                    f"unexpected marker inside scan: 0xFF{nxt:02X}"
                    if nxt is not None
                    else "truncated entropy stream"
                )
            unstuffed.append(b)
            i += 1
        nbits_total = len(unstuffed) * 8
        bitpos = 0

        def get_bits(n):
            nonlocal bitpos
            if bitpos + n > nbits_total:
                raise ValueError("truncated entropy stream")
            v = 0
            for _ in range(n):
                byte_i, bit_i = divmod(bitpos, 8)
                v = (v << 1) | ((unstuffed[byte_i] >> (7 - bit_i)) & 1)
                bitpos += 1
            return v

        def read_symbol(lut):
            code, ln = 0, 0
            while ln < 17:
                code = (code << 1) | get_bits(1)
                ln += 1
                if (ln, code) in lut:
                    return lut[(ln, code)]
            raise ValueError("invalid huffman code in scan")

        def extend(v, size):
            if size == 0:
                return 0
            return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

        ch, cw = (h // 2, w // 2) if subsampling == "420" else (h, w)
        planes = [
            np.zeros((h, w), dtype=np.int32),
            np.zeros((ch, cw), dtype=np.int32),
            np.zeros((ch, cw), dtype=np.int32),
        ]
        preds = [0, 0, 0]

        def decode_block(comp, bx, by):
            dc_lut, ac_lut = luts[comp]
            flat = [0] * 64
            s = read_symbol(dc_lut)
            preds[comp] += extend(get_bits(s), s)
            flat[0] = preds[comp]
            k = 1
            while k < 64:
                sym = read_symbol(ac_lut)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                flat[k] = extend(get_bits(size), size)
                k += 1
            coeff = np.zeros(64)
            for ii, v in enumerate(flat):
                coeff[zz[ii]] = v
            coeff = coeff.reshape(8, 8) * qmats[comp]
            blk = M.T @ coeff @ M + 128.0
            planes[comp][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                np.clip(np.round(blk), 0, 255).astype(np.int32)
            )

        if subsampling == "420":
            for my in range(h // 16):
                for mx in range(w // 16):
                    for dy in range(2):
                        for dx in range(2):
                            decode_block(0, mx * 2 + dx, my * 2 + dy)
                    decode_block(1, mx, my)
                    decode_block(2, mx, my)
        else:
            for my in range(h // 8):
                for mx in range(w // 8):
                    decode_block(0, mx, my)
                    decode_block(1, mx, my)
                    decode_block(2, mx, my)

        yv = planes[0]
        if subsampling == "420":  # pixel-replication upsample
            cbf = np.repeat(np.repeat(planes[1], 2, axis=0), 2, axis=1)
            crf = np.repeat(np.repeat(planes[2], 2, axis=0), 2, axis=1)
        else:
            cbf, crf = planes[1], planes[2]
        cb_ = cbf - 128
        cr_ = crf - 128
        r = yv + ((fix_cr_r * cr_ + 32768) >> 16)
        g = yv - ((fix_cb_g * cb_ + fix_cr_g * cr_ + 32768) >> 16)
        b = yv + ((fix_cb_b * cb_ + 32768) >> 16)
        rgb = np.stack(
            [np.clip(c, 0, 255) for c in (r, g, b)], axis=-1
        ).astype(np.uint8)
        return w, h, subsampling, bytes(rgb.tobytes())

    return decode


def encode_jpeg_color(y, cb, cr, subsampling: str = "420") -> bytes:
    """Baseline YCbCr color JPEG writer. Thin wrapper over the by-value
    kernel codec; see the module docstring for the plane contract."""
    return _make_jpeg_color_encoder()(y, cb, cr, subsampling)


def decode_jpeg_color(content: bytes) -> tuple[int, int, str, bytes]:
    """Baseline color JPEG decoder -> (width, height, subsampling,
    row-major interleaved RGB bytes)."""
    return _make_jpeg_color_decoder()(content)


def jpeg_color_features(media: DataFrame) -> DataFrame:
    """Decoded-RGB features over baseline color-JPEG assets via
    Arrow-batched mapInPandas — dimensions, subsampling, exact
    per-channel sums, global min/max. Malformed or non-3-component
    payloads (e.g. the grayscale arm's files in a mixed directory)
    quarantine, like every media kernel."""
    import pandas as pd

    decode = _make_jpeg_color_decoder()

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "asset_id", "width", "height", "channels", "subsampling",
                "r_sum", "g_sum", "b_sum", "rgb_min", "rgb_max",
            )}
            img = pdf[pdf["modality"] == "image"]
            for asset_id, content in zip(img["asset_id"], img["content"]):
                try:
                    w, h, sub, rgb = decode(bytes(content))
                except ValueError:
                    continue
                rows["asset_id"].append(asset_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(3)
                rows["subsampling"].append(sub)
                rows["r_sum"].append(sum(rgb[0::3]))
                rows["g_sum"].append(sum(rgb[1::3]))
                rows["b_sum"].append(sum(rgb[2::3]))
                rows["rgb_min"].append(min(rgb))
                rows["rgb_max"].append(max(rgb))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=COLOR_FEATURES_SCHEMA)


def _s4(t: int) -> int:
    return 1 if t % 8 in (0, 3, 4, 7) else -1


def color_plane_value(plane: str, i: int, x: int, y: int) -> int:
    """The closed-form fixture value of plane ∈ {y, cb, cr} at PLANE
    coordinates (x, y) for asset i — the single source of truth shared
    by the fixture builder, the Python referee in tests, and (textually
    mirrored) the SQL oracle. Same DCT-basis family as the grayscale
    arm; per-plane k formulas differ so a component-routing bug (Cb/Cr
    swap, wrong quant table) value-mismatches."""
    bx, by = x // 8, y // 8
    if plane == "y":
        k_dc = ((bx + 2 * by + 3 * i) % 7) - 3
        k_a = ((bx + i) % 5) - 2
        k_b = ((by + 2 * i) % 5) - 2
        k_c = ((bx + by + i) % 3) - 1
    elif plane == "cb":
        k_dc = ((bx + by + i) % 5) - 2
        k_a = ((bx + 2 * i) % 3) - 1
        k_b = ((by + i) % 3) - 1
        k_c = 0
    else:  # cr
        k_dc = ((2 * bx + by + i) % 5) - 2
        k_a = ((by + 2 * i) % 3) - 1
        k_b = ((bx + i) % 3) - 1
        k_c = 0
    return 128 + 2 * (
        k_dc
        + k_a * _s4(x % 8)
        + k_b * _s4(y % 8)
        + k_c * _s4(x % 8) * _s4(y % 8)
    )


def color_asset_dims(i: int) -> tuple[int, int, str]:
    """(width, height, subsampling) of color fixture asset i: even i are
    4:2:0 (16x16 or 32x16), odd are 4:4:4 (16x16 or 24x16)."""
    if i % 2 == 0:
        return 16 * (1 + (i // 2) % 2), 16, "420"
    return 8 * (2 + (i // 2) % 2), 16, "444"


def build_color_asset(i: int) -> bytes:
    """Encode fixture asset i from its closed-form planes."""
    w, h, sub = color_asset_dims(i)
    cw, chh = (w // 2, h // 2) if sub == "420" else (w, h)
    y = [[color_plane_value("y", i, x, yy) for x in range(w)] for yy in range(h)]
    cb = [[color_plane_value("cb", i, x, yy) for x in range(cw)] for yy in range(chh)]
    cr = [[color_plane_value("cr", i, x, yy) for x in range(cw)] for yy in range(chh)]
    return encode_jpeg_color(y, cb, cr, sub)


def expected_rgb(i: int, x: int, y: int) -> tuple[int, int, int]:
    """The decode contract's RGB at full-res (x, y) for asset i — closed
    form: plane values (chroma at x//2, y//2 for 4:2:0) through the
    fixed-point conversion. The Python referee for tests; the SQL oracle
    mirrors it with FLOOR(x/65536.0)."""
    w, h, sub = color_asset_dims(i)
    if sub == "420":
        cx, cy = x // 2, y // 2
    else:
        cx, cy = x, y
    yv = color_plane_value("y", i, x, y)
    cb_ = color_plane_value("cb", i, cx, cy) - 128
    cr_ = color_plane_value("cr", i, cx, cy) - 128
    r = yv + ((_FIX_CR_R * cr_ + 32768) >> 16)
    g = yv - ((_FIX_CB_G * cb_ + _FIX_CR_G * cr_ + 32768) >> 16)
    b = yv + ((_FIX_CB_B * cb_ + 32768) >> 16)
    clamp = lambda v: max(0, min(255, v))  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def make_jpeg_color_media(spark, n: int = 12) -> DataFrame:
    """Deterministic color-JPEG fixture frame in the standard media
    schema (asset_id, modality, meta, content) — the in-memory twin of
    the on-disk jc*.jpg assets."""
    rows: list[tuple[Any, ...]] = []
    for i in range(n):
        w, h, sub = color_asset_dims(i)
        content = build_color_asset(i)
        rows.append((
            f"jc{i:04d}",
            "image",
            {"mime": "image/jpeg", "width": str(w), "height": str(h),
             "subsampling": sub},
            bytearray(content),
        ))
    return spark.createDataFrame(
        rows,
        "asset_id string, modality string, meta map<string,string>, "
        "content binary",
    )
