"""Multimodal pipeline registered as driver queries (rows-only: the
Arrow/mapInPandas decode path has no ANSI-SQL twin; invariants are
pytest-gated in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
)
from taipei_bi_etl_spark.queries import query


@query("multimodal_feature_extract", oracle=None, tags=("multimodal", "extension"))
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload + typed metadata → Arrow-batched feature vectors
    (mapInPandas) → per-kind rollup of feature centroids."""
    feats = extract_features(synthesize_media(spark, sf_dir))
    return (
        feats.select(
            "media_id",
            "kind",
            F.element_at("features", 1).alias("f0"),
        )
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.avg("f0"), 6).alias("avg_f0"),
        )
    )


@query("multimodal_frame_sample", oracle=None, tags=("multimodal", "extension"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out (1 row → N frames) + per-media frame
    byte accounting — the shuffle-free mapInPandas expansion shape."""
    frames = sample_frames(synthesize_media(spark, sf_dir))
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("frame_bytes"),
    )
