"""Multimodal workload entries (rows-only: media fixtures are generated
in-memory; the decode kernels are deterministic stubs — see
operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators.multimodal import (
    extract_features,
    make_fake_media,
    sample_frames,
)
from delta_unity_duckdb_spark.workload.registry import query


@query("multimodal_features")
def multimodal_features(spark, sf_dir):
    """binary → feature vectors via Arrow-batched mapInPandas (1:1).

    Rows-only BY DESIGN (the one remaining oracle-less entry): the feature
    kernel is the documented codec stub (operators/multimodal.py — no
    PIL/ffmpeg in the container), so a SQL twin would only re-verify the
    stub's arithmetic, not decode correctness. Shape/determinism are
    pinned in tests/test_multimodal.py; the frame-sampling sibling
    (multimodal_frame_stats) IS oracle-checked. The feature array leaves
    as JSON text per the output convention (registry.normalize_output)."""
    media = make_fake_media(spark, n=48)
    return extract_features(media).select(
        "asset_id", "modality", "n_bytes", "sha256", "feature"
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
