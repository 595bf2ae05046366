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
    """binary → feature vectors via Arrow-batched mapInPandas (1:1)."""
    media = make_fake_media(spark, n=48)
    return extract_features(media).select(
        "asset_id", "modality", "n_bytes", "sha256", "feature"
    )


@query("multimodal_frame_stats")
def multimodal_frame_stats(spark, sf_dir):
    """Video frame sampling (1:N explode) + per-asset frame counts."""
    media = make_fake_media(spark, n=48)
    return (
        sample_frames(media, every_ms=500)
        .groupBy("asset_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
