"""Multimodal workload entries. Media fixtures are generated in-memory;
the mp4-video decode kernel is a deterministic stub, while the AUDIO
(RIFF/PCM16 WAV) and IMAGE (PNG and baseline grayscale JPEG) arms are
real pure-stdlib decoders (see operators/multimodal.py) — their
`audio_wav_features` / `image_png_features` / `image_jpeg_features`
oracles regenerate the closed-form waveform/pixel functions in SQL and
value-check the decoded features."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators.multimodal import (
    extract_features,
    make_fake_media,
    sample_frames,
)
from delta_unity_duckdb_spark.workload.registry import query


def _features_oracle_sql(n: int = 48) -> str:
    """Independent replay of the closed-form media fixture + stub kernel
    in pure Python hashlib, emitted as literal VALUES rows.

    DuckDB's ``sha256`` only accepts VARCHAR, so the digest-of-binary
    chain can't be expressed in SQL directly; the replay here recomputes
    every expected row from the fixture parameters alone (asset i ⇒
    content = sha256("asset-i") × 4 ⇒ sha256 + first-8-bytes feature) —
    it shares no code path with the Spark query, so a mapInPandas bug
    (row misalignment, batch truncation, serialization drift) still
    hash-mismatches. The decode KERNEL itself remains the documented
    codec stub; what this oracle certifies is the distributed plumbing."""
    import hashlib

    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * 4
        sha = hashlib.sha256(content).hexdigest()
        feat = ",".join(str(b) for b in hashlib.sha256(content).digest()[:8])
        rows.append(
            f"('a{i:04d}', '{modality}', 128, '{sha}', '{feat}')"
        )
    return (
        "SELECT asset_id, modality, CAST(n_bytes AS BIGINT) AS n_bytes,"
        " sha256, feature_q FROM (VALUES "
        + ", ".join(rows)
        + ") t(asset_id, modality, n_bytes, sha256, feature_q)"
        " ORDER BY asset_id"
    )


@query("multimodal_features", oracle=_features_oracle_sql(48),
       oracle_kind="closed_form_replay")
def multimodal_features(spark, sf_dir):
    """binary → feature vectors via Arrow-batched mapInPandas (1:1).

    The feature kernel is the documented codec stub (operators/
    multimodal.py — no PIL/ffmpeg in the container), so value-level
    verification targets the PLUMBING: fixture → mapInPandas → 1:1 row
    alignment → typed output, against an independent Python-hashlib
    replay of the closed-form fixture (see ``_features_oracle_sql``).
    ``feature_q`` re-quantizes the stub's b/255.0 floats back to the
    exact digest bytes ((b/255.0)*255 rounds to b for every b in 0..255),
    so the compared text is integer-exact — no float-formatting
    divergence between engines. The raw double feature path stays
    pinned in tests/test_multimodal.py."""
    media = make_fake_media(spark, n=48)
    return (
        extract_features(media)
        .select(
            "asset_id",
            "modality",
            "n_bytes",
            "sha256",
            F.transform(
                "feature", lambda x: F.round(x * 255).cast("bigint")
            ).alias("feature_q"),
        )
        .orderBy("asset_id")
    )


@query(
    "multimodal_frame_stats",
    # make_fake_media is a closed-form fixture: asset i is a video iff
    # i % 3 == 2, with duration_ms = 3000 + i*500, so sampling every
    # 500 ms yields (3000 + i*500) // 500 = 6 + i frames. The oracle
    # regenerates those counts from the same parameters (n=48), so a
    # mapInPandas explode bug (dropped frame, wrong duration parse)
    # hash-mismatches.
    oracle="""
    SELECT printf('a%04d', CAST(i AS INTEGER)) AS asset_id,
           CAST((3000 + i * 500) // 500 AS BIGINT) AS n_frames
    FROM range(48) t(i) WHERE i % 3 = 2
    """,
    oracle_kind="closed_form_replay",
)
def multimodal_frame_stats(spark, sf_dir):
    """Video frame sampling (1:N explode via Arrow-batched mapInPandas) +
    per-asset frame counts, oracle-checked against the fixture's
    closed-form frame math."""
    media = make_fake_media(spark, n=48)
    return (
        sample_frames(media, every_ms=500)
        .groupBy("asset_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )


@query(
    "audio_wav_features",
    oracle="""
    WITH params AS (
      SELECT i, 4000 + 250 * (i % 8) AS n, 13 + (i % 7) AS step
      FROM (SELECT UNNEST(RANGE(0, 24)) AS i)),
    samples AS (
      SELECT p.i, t.t, ((t.t * p.step) % 2048) - 1024 AS s
      FROM params p, LATERAL (SELECT UNNEST(RANGE(0, p.n)) AS t) t),
    lagged AS (
      SELECT i, t, s, LAG(s) OVER (PARTITION BY i ORDER BY t) AS prev
      FROM samples),
    feat AS (
      SELECT i,
             COUNT(*) AS n_samples,
             MAX(ABS(s)) AS peak,
             SUM(CAST(s AS BIGINT) * s) AS sum_sq,
             SUM(CASE WHEN prev IS NOT NULL
                       AND ((prev >= 0) <> (s >= 0)) THEN 1 ELSE 0 END) AS zcr
      FROM lagged GROUP BY i)
    SELECT 'w' || lpad(CAST(i AS VARCHAR), 4, '0') AS asset_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST((n_samples * 1000) // 8000 AS BIGINT) AS duration_ms,
           CAST(peak AS BIGINT) AS peak,
           CAST(sum_sq AS BIGINT) AS sum_sq,
           CAST(zcr AS BIGINT) AS zcr,
           CAST(FLOOR(SQRT(CAST(sum_sq AS DOUBLE) / n_samples) * 1000)
                AS BIGINT) AS rms_milli
    FROM feat ORDER BY asset_id
    """,
    oracle_kind="closed_form_replay",
)
def audio_wav_features(spark, sf_dir):
    """REAL audio decode — the multimodal arm that is no longer a stub:
    the fixture carries actual RIFF/PCM16 WAV payloads (encoder
    cross-validated against stdlib ``wave`` in tests), the mapInPandas
    kernel walks the RIFF chunks and extracts peak / exact-int64 energy /
    zero-crossings / floor-quantized RMS from the DECODED samples, and
    the oracle regenerates the closed-form sawtooth waveform in SQL and
    computes the same aggregates — so any byte-layout, chunk-walking,
    endianness, or sample-alignment bug in the decoder value-mismatches.

    Scale: identical shape to ``multimodal_features`` — Arrow-batched
    decode, one pass per record batch, no driver involvement; malformed
    payloads quarantine (drop) rather than abort the pass."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        audio_features,
        make_wav_media,
    )

    media = make_wav_media(spark, 24)
    return audio_features(media).orderBy("asset_id")


@query(
    "image_png_features",
    oracle="""
    WITH params AS (
      SELECT i, 32 + 8 * (i % 5) AS w, 24 + 8 * (i % 3) AS h
      FROM (SELECT UNNEST(RANGE(0, 16)) AS i)),
    px AS (
      SELECT p.i, p.w, p.h,
             (7 * x.x + 13 * y.y + 29 * c.c + 31 * p.i) % 256 AS v
      FROM params p,
           LATERAL (SELECT UNNEST(RANGE(0, p.w)) AS x) x,
           LATERAL (SELECT UNNEST(RANGE(0, p.h)) AS y) y,
           LATERAL (SELECT UNNEST(RANGE(0, 3)) AS c) c),
    feat AS (
      SELECT i, w, h,
             CAST(SUM(v) AS BIGINT) AS pix_sum,
             MIN(v) AS pix_min, MAX(v) AS pix_max
      FROM px GROUP BY i, w, h)
    SELECT 'p' || lpad(CAST(i AS VARCHAR), 4, '0') AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS channels,
           pix_sum,
           CAST(pix_min AS BIGINT) AS pix_min,
           CAST(pix_max AS BIGINT) AS pix_max,
           CAST((pix_sum * 1000) // (w * h * 3) AS BIGINT) AS mean_milli
    FROM feat ORDER BY asset_id
    """,
    oracle_kind="closed_form_replay",
)
def image_png_features(spark, sf_dir):
    """REAL image decode — PNG, pure stdlib (zlib inflate + all five
    scanline unfilters + per-chunk CRC validation): the fixture carries
    actual PNG payloads whose encoder rotates the filter type per row,
    the kernel decodes the pixels, and the oracle regenerates the
    closed-form pixel function in SQL and aggregates — any unfilter,
    CRC, stride, or channel-order bug value-mismatches. With this, only
    video/JPEG codecs remain stubbed (genuinely absent libs).

    Scale: same Arrow-batched one-pass shape as the other media ops;
    malformed payloads quarantine rather than abort."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        image_features,
        make_png_media,
    )

    return image_features(make_png_media(spark, 16)).orderBy("asset_id")


@query(
    "image_jpeg_features",
    oracle="""
    WITH params AS (
      SELECT i, 8 * (2 + (i % 3)) AS w, 8 * (1 + (i % 2)) AS h
      FROM (SELECT UNNEST(RANGE(0, 16)) AS i)),
    px AS (
      SELECT p.i, p.w, p.h,
             128 + 2 * (
               ((((x.x // 8) + 2 * (y.y // 8) + 3 * p.i) % 7) - 3)
               + ((((x.x // 8) + p.i) % 5) - 2)
                 * (CASE WHEN (x.x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((y.y // 8) + 2 * p.i) % 5) - 2)
                 * (CASE WHEN (y.y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((x.x // 8) + (y.y // 8) + p.i) % 3) - 1)
                 * (CASE WHEN (x.x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                 * (CASE WHEN (y.y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
             ) AS v
      FROM params p,
           LATERAL (SELECT UNNEST(RANGE(0, p.w)) AS x) x,
           LATERAL (SELECT UNNEST(RANGE(0, p.h)) AS y) y),
    feat AS (
      SELECT i, w, h,
             CAST(SUM(v) AS BIGINT) AS pix_sum,
             MIN(v) AS pix_min, MAX(v) AS pix_max
      FROM px GROUP BY i, w, h)
    SELECT 'j' || lpad(CAST(i AS VARCHAR), 4, '0') AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS channels,
           pix_sum,
           CAST(pix_min AS BIGINT) AS pix_min,
           CAST(pix_max AS BIGINT) AS pix_max,
           CAST((pix_sum * 1000) // (w * h) AS BIGINT) AS mean_milli
    FROM feat ORDER BY asset_id
    """,
    oracle_kind="closed_form_replay",
)
def image_jpeg_features(spark, sf_dir):
    """REAL JPEG decode — baseline sequential DCT (T.81), pure
    stdlib + numpy: marker walk, canonical huffman tables built from the
    file's own DHT segments, 0xFF00 byte unstuffing, DC prediction,
    dequantize → dezigzag → IDCT. The fixture makes a LOSSY codec
    oracle-checkable: pixels are synthesized from DCT coefficients at
    (0,0)/(0,4)/(4,0)/(4,4) only, whose IDCT contribution is the exact
    rational ±F/8 — so encode→decode is bit-lossless for this family and
    the oracle regenerates the closed-form pixel function with integer
    SQL. Any huffman, zigzag, dequant, stuffing, or IDCT bug
    value-mismatches. The 16-asset corpus exercises DC prediction
    (per-block DC), AC run-length incl. ZRL (coefficient at zigzag 24
    behind a 23-zero run), and byte stuffing (0xFF bytes arise in 11 of
    16 entropy streams).

    Scale: same Arrow-batched one-pass mapInPandas shape as the other
    media arms; malformed payloads quarantine rather than abort."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        jpeg_features,
        make_jpeg_media,
    )

    return jpeg_features(make_jpeg_media(spark, 16)).orderBy("asset_id")


@query(
    "image_jpeg_color_features",
    oracle="""
    WITH params AS (
      SELECT i,
             CASE WHEN i % 2 = 0 THEN 16 * (1 + (i // 2) % 2)
                  ELSE 8 * (2 + (i // 2) % 2) END AS w,
             16 AS h,
             CASE WHEN i % 2 = 0 THEN '420' ELSE '444' END AS sub
      FROM (SELECT UNNEST(RANGE(0, 12)) AS i)),
    px AS (
      SELECT p.i, p.w, p.h, p.sub, x.x, y.y,
             128 + 2 * (
               ((((x.x // 8) + 2 * (y.y // 8) + 3 * p.i) % 7) - 3)
               + ((((x.x // 8) + p.i) % 5) - 2)
                 * (CASE WHEN (x.x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((y.y // 8) + 2 * p.i) % 5) - 2)
                 * (CASE WHEN (y.y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((x.x // 8) + (y.y // 8) + p.i) % 3) - 1)
                 * (CASE WHEN (x.x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                 * (CASE WHEN (y.y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
             ) AS y_v,
             CASE WHEN p.sub = '420' THEN x.x // 2 ELSE x.x END AS cx,
             CASE WHEN p.sub = '420' THEN y.y // 2 ELSE y.y END AS cy
      FROM params p,
           LATERAL (SELECT UNNEST(RANGE(0, p.w)) AS x) x,
           LATERAL (SELECT UNNEST(RANGE(0, p.h)) AS y) y),
    ycc AS (
      SELECT i, w, h, sub, x, y, y_v,
             (128 + 2 * (
               ((((cx // 8) + (cy // 8) + i) % 5) - 2)
               + ((((cx // 8) + 2 * i) % 3) - 1)
                 * (CASE WHEN (cx % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((cy // 8) + i) % 3) - 1)
                 * (CASE WHEN (cy % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
             )) - 128 AS cb_,
             (128 + 2 * (
               (((2 * (cx // 8) + (cy // 8) + i) % 5) - 2)
               + ((((cy // 8) + 2 * i) % 3) - 1)
                 * (CASE WHEN (cx % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((cx // 8) + i) % 3) - 1)
                 * (CASE WHEN (cy % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
             )) - 128 AS cr_
      FROM px),
    rgb AS (
      SELECT i, w, h, sub,
             LEAST(255, GREATEST(0, y_v
               + CAST(FLOOR((91881 * cr_ + 32768) / 65536.0) AS BIGINT))) AS r,
             LEAST(255, GREATEST(0, y_v
               - CAST(FLOOR((22554 * cb_ + 46802 * cr_ + 32768) / 65536.0) AS BIGINT))) AS g,
             LEAST(255, GREATEST(0, y_v
               + CAST(FLOOR((116130 * cb_ + 32768) / 65536.0) AS BIGINT))) AS b
      FROM ycc),
    feat AS (
      SELECT i, w, h, sub,
             CAST(SUM(r) AS BIGINT) AS r_sum,
             CAST(SUM(g) AS BIGINT) AS g_sum,
             CAST(SUM(b) AS BIGINT) AS b_sum,
             MIN(LEAST(r, g, b)) AS rgb_min,
             MAX(GREATEST(r, g, b)) AS rgb_max
      FROM rgb GROUP BY i, w, h, sub)
    SELECT 'jc' || lpad(CAST(i AS VARCHAR), 4, '0') AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS channels,
           sub AS subsampling,
           r_sum, g_sum, b_sum,
           CAST(rgb_min AS BIGINT) AS rgb_min,
           CAST(rgb_max AS BIGINT) AS rgb_max
    FROM feat ORDER BY asset_id
    """,
    oracle_kind="closed_form_replay",
)
def image_jpeg_color_features(spark, sf_dir):
    """REAL chroma-subsampled COLOR JPEG decode — the arm round 6 left
    gated "on absent libjpeg", now implemented in the from-scratch T.81
    codec (operators/jpeg_color.py): 3-component SOF0, per-component
    quant/huffman table routing from the file's own DQT/DHT segments,
    interleaved-MCU entropy decode (4 luma + Cb + Cr blocks per MCU at
    4:2:0), per-component DC prediction, 2x2 chroma upsampling, and
    fixed-point YCbCr->RGB (libjpeg's 16-bit constants, floor shift).

    Oracle-checkable lossy decode via the same DCT-basis-exact fixture
    family as the grayscale arm, applied per PLANE with plane-distinct
    coefficient formulas — a Cb/Cr swap, wrong quant table, wrong MCU
    block order, or an upsampling bug value-mismatches. The 12-asset
    corpus covers both subsamplings and two widths each; the SQL oracle
    replays the closed-form planes and the exact fixed-point conversion
    (FLOOR(x/65536.0): numerators < 2^25, exact in doubles).

    Scale: same Arrow-batched one-pass mapInPandas shape as every media
    arm; malformed or non-3-component payloads quarantine."""
    from delta_unity_duckdb_spark.operators.jpeg_color import (
        jpeg_color_features,
        make_jpeg_color_media,
    )

    return jpeg_color_features(
        make_jpeg_color_media(spark, 12)
    ).orderBy("asset_id")


@query(
    "image_resize_stats",
    oracle="""
    WITH params AS (
      SELECT i, 32 + 8 * (i % 5) AS sw, 24 + 8 * (i % 3) AS sh
      FROM (SELECT UNNEST(RANGE(0, 16)) AS i)),
    px AS (
      SELECT p.i,
             (7 * ((x.x * p.sw) // 16) + 13 * ((y.y * p.sh) // 12)
              + 29 * c.c + 31 * p.i) % 256 AS v
      FROM params p,
           LATERAL (SELECT UNNEST(RANGE(0, 16)) AS x) x,
           LATERAL (SELECT UNNEST(RANGE(0, 12)) AS y) y,
           LATERAL (SELECT UNNEST(RANGE(0, 3)) AS c) c),
    feat AS (
      SELECT i, CAST(SUM(v) AS BIGINT) AS pix_sum,
             MIN(v) AS pix_min, MAX(v) AS pix_max
      FROM px GROUP BY i)
    SELECT 'p' || lpad(CAST(i AS VARCHAR), 4, '0') AS asset_id,
           CAST(16 AS BIGINT) AS width,
           CAST(12 AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS channels,
           pix_sum,
           CAST(pix_min AS BIGINT) AS pix_min,
           CAST(pix_max AS BIGINT) AS pix_max,
           CAST((pix_sum * 1000) // (16 * 12 * 3) AS BIGINT) AS mean_milli
    FROM feat ORDER BY asset_id
    """,
    oracle_kind="closed_form_replay",
)
def image_resize_stats(spark, sf_dir):
    """REAL resize→re-encode→re-decode loop for the PNG arm: the fixture
    images resize to 16x12 by nearest-neighbor (decode, resample at
    ``src = floor(dst*src_dim/dst_dim)``, re-encode with rotating
    filters), then the feature pass decodes the RESIZED payloads. The
    oracle composes the closed-form pixel function with the same NN
    index mapping in SQL — the full decode→transform→encode→decode
    chain must agree value-for-value, or any stage broke.

    Scale: two Arrow-batched passes (resize, features) — in deployment
    the resized table persists between them; here they chain in one
    plan."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        image_features,
        make_png_media,
        resize_png_images,
    )

    resized = resize_png_images(make_png_media(spark, 16), 16, 12)
    return image_features(resized).orderBy("asset_id")


@query(
    "video_frame_features",
    oracle="""
    WITH assets AS (
      SELECT i, 4 + (i % 3) AS n_frames
      FROM (SELECT UNNEST(RANGE(0, 8)) AS i)),
    kept AS (
      -- fps=4 (frame every 250ms), every_ms=500 => every 2nd frame kept
      SELECT a.i, f.f
      FROM assets a, LATERAL (SELECT UNNEST(RANGE(0, a.n_frames)) AS f) f
      WHERE f.f % 2 = 0),
    px AS (
      SELECT k.i, k.f,
             (7 * x.x + 13 * y.y + 29 * c.c + 41 * k.f + 31 * k.i) % 256 AS v
      FROM kept k,
           LATERAL (SELECT UNNEST(RANGE(0, 16)) AS x) x,
           LATERAL (SELECT UNNEST(RANGE(0, 12)) AS y) y,
           LATERAL (SELECT UNNEST(RANGE(0, 3)) AS c) c),
    feat AS (
      SELECT i, f, CAST(SUM(v) AS BIGINT) AS pix_sum FROM px GROUP BY i, f)
    SELECT 'v' || lpad(CAST(i AS VARCHAR), 4, '0') AS asset_id,
           CAST(f AS BIGINT) AS frame_index,
           CAST(16 AS BIGINT) AS width,
           CAST(12 AS BIGINT) AS height,
           pix_sum,
           CAST((pix_sum * 1000) // (16 * 12 * 3) AS BIGINT) AS mean_milli
    FROM feat ORDER BY asset_id, frame_index
    """,
    oracle_kind="closed_form_replay",
)
def video_frame_features(spark, sf_dir):
    """REAL video-frame extraction + per-frame decode: the fixture's
    motion-PNG containers (the MJPEG pattern with PNG payloads —
    length-prefixed real frames behind a tiny header) are walked by
    ``sample_frames_pngv`` (1 row → N frame rows, every-500ms sampling at
    4 fps = every 2nd frame), and each SAMPLED frame is then actually
    PNG-decoded by ``frame_features``. The oracle regenerates the
    closed-form per-frame pixel function for the kept frames — container
    walking, sampling cadence, and frame decode must all agree. Standard
    containers (mp4/mkv) still require ffmpeg and remain stubbed in
    ``sample_frames``; the extraction/decode dataflow itself is no
    longer a stub.

    Scale: two Arrow-batched passes; the frame explosion multiplies rows
    BEFORE the per-frame decode, so frame work parallelizes across the
    cluster rather than serializing inside one asset's task."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        frame_features,
        make_pngv_media,
        sample_frames_pngv,
    )

    frames = sample_frames_pngv(make_pngv_media(spark, 8), every_ms=500)
    return frame_features(frames).orderBy("asset_id", "frame_index")


@query(
    "image_pixel_dedup",
    oracle="""
    WITH assets AS (
      SELECT j, j % 8 AS k FROM (SELECT UNNEST(RANGE(0, 16)) AS j)),
    groups AS (
      SELECT k,
             MIN('d' || lpad(CAST(j AS VARCHAR), 4, '0')) AS survivor,
             COUNT(*) AS n_assets,
             -- one rotate-filtered + one filter-0 payload per group
             CAST(2 AS BIGINT) AS n_byte_variants
      FROM assets GROUP BY k)
    SELECT survivor, CAST(n_assets AS BIGINT) AS n_assets, n_byte_variants
    FROM groups ORDER BY survivor
    """,
    oracle_kind="closed_form_replay",
)
def image_pixel_dedup(spark, sf_dir):
    """Content-defined image dedup — the dedup a byte hash CANNOT do:
    the fixture holds 8 distinct images, each stored TWICE under
    different PNG encodings (rotating scanline filters vs filter-0), so
    every byte-level key sees 16 distinct payloads while the decoded
    pixel key must find exactly 8 groups of 2 with 2 byte-variants
    each. Discovering that grouping requires correctly decoding BOTH
    encodings of every image — a wrong unfilter splits a group and the
    oracle (closed-form fixture-parameter replay) mismatches.

    Scale: decode is the Arrow-batched map; the dedup itself is one
    keyed shuffle on the 28-byte pixel digest — exactly the
    `dedup_exact` shape with a decoded-content key. The byte-variant
    count is the monitoring signal ("how much re-encoded duplication
    does byte dedup miss")."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        image_pixel_dedup as _dedup,
        make_png_media_mixed_encodings,
    )

    media = make_png_media_mixed_encodings(spark, 16)
    return _dedup(media).select(
        "survivor", "n_assets", "n_byte_variants"
    ).orderBy("survivor")


@query(
    "image_dhash_near_dup",
    oracle="""
    WITH assets AS (
      SELECT j, j % 8 AS k FROM (SELECT UNNEST(RANGE(0, 16)) AS j)),
    ks AS (SELECT DISTINCT k FROM assets),
    bits AS (
      SELECT ks.k, gy.gy, gx.gx,
             CASE WHEN ((31 * (gx.gx + 1) + 47 * gy.gy + 61 * ks.k) % 224 + 16)
                     > ((31 * gx.gx + 47 * gy.gy + 61 * ks.k) % 224 + 16)
                  THEN '1' ELSE '0' END AS b
      FROM ks,
           LATERAL (SELECT UNNEST(RANGE(0, 8)) AS gy) gy,
           LATERAL (SELECT UNNEST(RANGE(0, 8)) AS gx) gx),
    sigs AS (
      SELECT k, string_agg(b, '' ORDER BY gy, gx) AS sig
      FROM bits GROUP BY k),
    grouped AS (
      SELECT s.sig AS dhash,
             MIN('h' || lpad(CAST(a.j AS VARCHAR), 4, '0')) AS survivor,
             COUNT(*) AS n_assets
      FROM assets a JOIN sigs s ON s.k = a.k
      GROUP BY s.sig)
    SELECT survivor, dhash, CAST(n_assets AS BIGINT) AS n_assets
    FROM grouped ORDER BY survivor
    """,
    oracle_kind="closed_form_replay",
)
def image_dhash_near_dup(spark, sf_dir):
    """Perceptual image near-dup via difference hash — the image
    analogue of SimHash: decode, grayscale, 9x8 NN grid, 64-bit
    horizontal-gradient signature, bucket on it. The fixture's 8 coarse
    patterns each appear twice with DIFFERENT pixels (variant noise off
    the sampling grid) and different byte encodings — exact/pixel dedup
    both see 16 distinct items; dHash must find exactly the 8 intended
    pairs. The oracle regenerates the coarse pattern's signature
    closed-form, so grayscale arithmetic, NN sampling geometry, bit
    order, and grouping are all value-checked.

    Scale: narrow Arrow decode map + ONE keyed shuffle on a 64-char
    key; Hamming-tolerant matching at scale bands the signature (4x16
    bits) into LSH buckets exactly like the text SimHash path."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        image_dhash_groups,
        make_png_media_perceptual,
    )

    media = make_png_media_perceptual(spark, 16)
    return image_dhash_groups(media).select(
        "survivor", "dhash", "n_assets"
    ).orderBy("survivor")


@query(
    "audio_energy_segments",
    oracle="""
    WITH assets AS (
      SELECT i, 4000 + 500 * (i % 4) AS n, 13 + (i % 7) AS step
      FROM (SELECT UNNEST(RANGE(0, 8)) AS i)),
    samp AS (
      SELECT a.i, t.t,
             CASE WHEN (t.t // 500) % 2 = 0
                  THEN ((t.t * a.step) % 2048) - 1024 ELSE 0 END AS s
      FROM assets a, LATERAL (SELECT UNNEST(RANGE(0, a.n)) AS t) t),
    wins AS (
      SELECT i, t // 250 AS win_idx, SUM(CAST(s AS BIGINT) * s) AS energy
      FROM samp GROUP BY i, t // 250),
    active AS (
      SELECT i, win_idx,
             win_idx - ROW_NUMBER() OVER (PARTITION BY i ORDER BY win_idx)
               AS grp
      FROM wins WHERE energy > 0),
    segs AS (
      SELECT i, grp, COUNT(*) AS n_wins FROM active GROUP BY i, grp),
    per_asset AS (
      SELECT i, COUNT(*) AS n_segments,
             CAST(SUM(n_wins) AS BIGINT) AS active_windows,
             CAST(MAX(n_wins) AS BIGINT) AS longest_wins
      FROM segs GROUP BY i)
    SELECT 'g' || lpad(CAST(i AS VARCHAR), 4, '0') AS asset_id,
           CAST(n_segments AS BIGINT) AS n_segments,
           active_windows,
           CAST((active_windows * 250 * 1000) // 8000 AS BIGINT) AS active_ms,
           CAST((longest_wins * 250 * 1000) // 8000 AS BIGINT)
             AS longest_segment_ms
    FROM per_asset ORDER BY asset_id
    """,
    oracle_kind="closed_form_replay",
)
def audio_energy_segments(spark, sf_dir):
    """VAD-style energy segmentation over REAL decoded audio — the
    silence-trimming pass a speech pipeline runs before ASR: decode the
    WAV, frame into 250-sample windows with exact int64 energies
    (``audio_window_energy``), threshold, and collapse consecutive
    active windows into segments with the islands-and-gaps window trick
    (``win_idx - row_number``). Per asset: segment count, active
    windows/milliseconds, longest segment. The fixture gates the
    sawtooth into 500-sample bursts so the segmentation is non-trivial;
    the oracle regenerates the gated waveform closed-form and replays
    the identical windowing + islands logic.

    Scale: the Arrow decode pass emits the window-energy frame (rows =
    samples/window, a 250x reduction before any shuffle); segmentation
    is one keyed window + one aggregate — the standard sessionization
    shape over decoded media."""
    from pyspark.sql import Window as W

    from delta_unity_duckdb_spark.operators.multimodal import (
        audio_window_energy,
        make_wav_media_gated,
    )

    wins = audio_window_energy(make_wav_media_gated(spark, 8), window=250)
    active = wins.filter(F.col("energy") > 0).select(
        "asset_id",
        "sample_rate",
        "win_idx",
        (
            F.col("win_idx")
            - F.row_number().over(
                W.partitionBy("asset_id").orderBy("win_idx")
            )
        ).alias("grp"),
    )
    segs = active.groupBy("asset_id", "sample_rate", "grp").agg(
        F.count(F.lit(1)).alias("n_wins")
    )
    return (
        segs.groupBy("asset_id", "sample_rate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("n_wins").cast("bigint").alias("active_windows"),
            F.max("n_wins").cast("bigint").alias("longest_wins"),
        )
        .select(
            "asset_id",
            "n_segments",
            "active_windows",
            F.expr("(active_windows * 250 * 1000) div sample_rate")
            .cast("bigint")
            .alias("active_ms"),
            F.expr("(longest_wins * 250 * 1000) div sample_rate")
            .cast("bigint")
            .alias("longest_segment_ms"),
        )
        .orderBy("asset_id")
    )


# -------------------------------------------------------------- on-disk ingest → decode (all three arms)
_INGEST_N = 120  # per modality; 240 assets total — the >100-asset contract


def _media_fixture_path() -> str:
    """Cached on-disk fixture home: .scale_data/ is repo-local and
    gitignored; the writer is idempotent so every caller (tests, bench,
    driver correctness workers) converges on identical bytes."""
    import os

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo, ".scale_data", f"media_fixture_{_INGEST_N}")


@query(
    "media_ingest_decode",
    oracle=f"""
    WITH wav_params AS (
      SELECT i, 4000 + 250 * (i % 8) AS ns, 13 + (i % 7) AS st
      FROM (SELECT UNNEST(RANGE(0, {_INGEST_N})) AS i)),
    wav_s AS (
      SELECT p.i, ((t.t * p.st) % 2048) - 1024 AS s
      FROM wav_params p, LATERAL (SELECT UNNEST(RANGE(0, p.ns)) AS t) t),
    wav_asset AS (
      SELECT i, COUNT(*) AS units, SUM(CAST(s AS BIGINT) * s) AS v
      FROM wav_s GROUP BY i),
    img_params AS (
      SELECT i, 32 + 8 * (i % 5) AS w, 24 + 8 * (i % 3) AS h
      FROM (SELECT UNNEST(RANGE(0, {_INGEST_N})) AS i)),
    img_px AS (
      SELECT p.i, (7 * x.x + 13 * y.y + 29 * c.c + 31 * p.i) % 256 AS v
      FROM img_params p,
           LATERAL (SELECT UNNEST(RANGE(0, p.w)) AS x) x,
           LATERAL (SELECT UNNEST(RANGE(0, p.h)) AS y) y,
           LATERAL (SELECT UNNEST(RANGE(0, 3)) AS c) c),
    img_asset AS (
      SELECT i, COUNT(*) AS units, SUM(CAST(v AS BIGINT)) AS v
      FROM img_px GROUP BY i),
    jpg_params AS (
      SELECT i, 8 * (2 + (i % 3)) AS w, 8 * (1 + (i % 2)) AS h
      FROM (SELECT UNNEST(RANGE(0, {_INGEST_N})) AS i)),
    jpg_px AS (
      SELECT p.i,
             128 + 2 * (
               ((((x.x // 8) + 2 * (y.y // 8) + 3 * p.i) % 7) - 3)
               + ((((x.x // 8) + p.i) % 5) - 2)
                 * (CASE WHEN (x.x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((y.y // 8) + 2 * p.i) % 5) - 2)
                 * (CASE WHEN (y.y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
               + ((((x.x // 8) + (y.y // 8) + p.i) % 3) - 1)
                 * (CASE WHEN (x.x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                 * (CASE WHEN (y.y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END)
             ) AS v
      FROM jpg_params p,
           LATERAL (SELECT UNNEST(RANGE(0, p.w)) AS x) x,
           LATERAL (SELECT UNNEST(RANGE(0, p.h)) AS y) y),
    jpg_asset AS (
      SELECT i, COUNT(*) AS units, SUM(CAST(v AS BIGINT)) AS v
      FROM jpg_px GROUP BY i)
    SELECT 'audio' AS modality, CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(units) AS BIGINT) AS units_total,
           CAST(SUM(v) AS BIGINT) AS value_sum,
           CAST(MIN(v) AS BIGINT) AS value_lo,
           CAST(MAX(v) AS BIGINT) AS value_hi
    FROM wav_asset
    UNION ALL
    SELECT 'image_jpeg', CAST(COUNT(*) AS BIGINT), CAST(SUM(units) AS BIGINT),
           CAST(SUM(v) AS BIGINT), CAST(MIN(v) AS BIGINT),
           CAST(MAX(v) AS BIGINT)
    FROM jpg_asset
    UNION ALL
    SELECT 'image_png', CAST(COUNT(*) AS BIGINT), CAST(SUM(units) AS BIGINT),
           CAST(SUM(v) AS BIGINT), CAST(MIN(v) AS BIGINT),
           CAST(MAX(v) AS BIGINT)
    FROM img_asset
    ORDER BY modality
    """,
    oracle_kind="closed_form_replay",
)
def media_ingest_decode(spark, sf_dir):
    """THE on-disk multimodal path, end-to-end: 360 real WAV/PNG/JPEG
    files on disk → Spark ``binaryFile`` source (distributed listing, one
    row per file) → ``ingest_binary_dir``'s typed MEDIA_SCHEMA mapping
    (modality + mime from extension) → hash-repartition by asset → ALL
    THREE real decode arms (RIFF/PCM16 chunk walk, PNG
    inflate+unfilter+CRC, baseline-JPEG huffman+IDCT) routed by the typed
    mime column → per-codec roll-up of per-asset exact aggregates
    (samples + energy for audio, pixel count + pixel sum for images). The
    oracle regenerates the closed-form waveforms/pixels in SQL, so a bug
    ANYWHERE in the chain — file listing, byte transport, extension
    routing, codec, Arrow batch alignment — value-mismatches; it cannot
    hide in the plumbing.

    Scale: this is the 100 TB ingest shape — listing and payloads stay
    distributed (no driver collect), decode is Arrow-batched mapInPandas,
    per-asset rows are a keyed narrow aggregate; the roll-up output is 3
    rows. Fixture writing is driver-side but idempotent + cached across
    calls (and ~5 MB); real deployments substitute their object store
    at the `ingest_binary_dir` seam.
    """
    from delta_unity_duckdb_spark.operators.multimodal import (
        write_media_fixture_dir,
    )

    path = _media_fixture_path()
    write_media_fixture_dir(
        path, n_wav=_INGEST_N, n_png=_INGEST_N, n_jpeg=_INGEST_N
    )
    return ingest_decode_rollup(spark, path)


def ingest_decode_rollup(spark, path: str):
    """Reusable ingest→decode→per-modality-rollup frame over any on-disk
    media directory — shared by the registered 240-asset oracle query and
    tools/bench_media_scale.py's scaled throughput arm."""
    from delta_unity_duckdb_spark.operators.multimodal import (
        audio_features,
        image_features,
        ingest_binary_dir,
        jpeg_features,
        repartition_by_asset,
    )

    media = ingest_binary_dir(spark, path)
    # binaryFile packs tiny files into few read tasks; spread the decode.
    media = repartition_by_asset(
        media, spark.sparkContext.defaultParallelism
    )
    af = audio_features(media.filter(F.col("modality") == "audio"))
    # Codec routing happens on the typed mime column the ingest assigned —
    # the PNG and JPEG kernels each see only payloads they can decode.
    imf = image_features(
        media.filter(F.col("meta.mime") == "image/png")
    )
    jpf = jpeg_features(
        media.filter(F.col("meta.mime") == "image/jpeg")
    )
    a = af.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("n_samples").cast("bigint").alias("units_total"),
        F.sum("sum_sq").cast("bigint").alias("value_sum"),
        F.min("sum_sq").cast("bigint").alias("value_lo"),
        F.max("sum_sq").cast("bigint").alias("value_hi"),
    ).select(F.lit("audio").alias("modality"), "*")

    def img_rollup(feats, label):
        return feats.select(
            (F.col("width") * F.col("height") * F.col("channels")).alias(
                "units"
            ),
            "pix_sum",
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assets"),
            F.sum("units").cast("bigint").alias("units_total"),
            F.sum("pix_sum").cast("bigint").alias("value_sum"),
            F.min("pix_sum").cast("bigint").alias("value_lo"),
            F.max("pix_sum").cast("bigint").alias("value_hi"),
        ).select(F.lit(label).alias("modality"), "*")

    b = img_rollup(imf, "image_png")
    c = img_rollup(jpf, "image_jpeg")
    return a.unionByName(b).unionByName(c).orderBy("modality")
