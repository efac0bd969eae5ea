"""Multimodal pipeline registered as driver queries.

``multimodal_feature_extract`` IS oracle-checked even though it runs
through Arrow/mapInPandas: the deterministic byte-histogram decoder is
re-expressible in SQL (the corpus is ASCII, so bytes == chars), which
pins the whole Python-worker path — schema, Arrow round-trip, float32
feature storage — against an engine that shares none of it.  Feature
values cross as ROUND(f*1e6) integers: the float32 storage error
(~4e-3 in micro units) cannot move a ROUND, while a FLOOR at exact
integer boundaries could.

``multimodal_frame_sample`` is oracle-checked via the closed form of
the byte-slice sampler (frame count and byte totals are pure arithmetic
on payload length); frame-content invariants live in
tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
)
from taipei_bi_etl_spark.queries import query

_FEATURE_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
         text
  FROM documents
  WHERE text IS NOT NULL
    AND octet_length(encode(text)) = length(text)
), feat AS (
  SELECT media_id, kind,
         CAST(round(
           len(list_filter(list_transform(string_split(text, ''),
                                          c -> ascii(c)),
                           a -> a % 16 = 0)) * 1000000.0 / length(text)
         ) AS BIGINT) AS f0_micros
  FROM media
)
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       ROUND(CAST(SUM(f0_micros) AS BIGINT) / 1000000.0 / COUNT(*), 6) AS avg_f0
FROM feat GROUP BY kind
"""


@query(
    "multimodal_feature_extract",
    oracle=_FEATURE_ORACLE,
    tags=("multimodal", "extension"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload + typed metadata → Arrow-batched feature vectors
    (mapInPandas) → per-kind rollup of the first histogram bucket."""
    # The SQL twin buckets CHARACTERS via ascii(); the Python decoder
    # buckets payload BYTES — equal only for ASCII seeds, so both
    # engines restrict to ASCII rows (the documented oracle
    # re-expression precondition, now enforced instead of assumed).
    media = synthesize_media(spark, sf_dir).filter(
        F.octet_length("payload")
        == F.length(F.decode(F.col("payload"), "UTF-8"))
    )
    feats = extract_features(media)
    per_media = feats.select(
        "kind",
        F.round(F.element_at("features", 1) * 1_000_000, 0)
        .cast("long")
        .alias("f0_micros"),
    )
    return per_media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.round(
            F.sum("f0_micros") / F.lit(1_000_000.0) / F.count(F.lit(1)), 6
        ).alias("avg_f0"),
    )


_FRAME_ORACLE = """
WITH video AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS L
  FROM documents
  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
)
SELECT media_id,
       CAST(CASE WHEN L >= 4 THEN 4 ELSE L END AS BIGINT) AS n_frames,
       CAST(CASE WHEN L >= 4 THEN 4 * (L // 4) ELSE L END AS BIGINT)
         AS frame_bytes
FROM video
"""


@query(
    "multimodal_frame_sample",
    oracle=_FRAME_ORACLE,
    tags=("multimodal", "extension"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out (1 row → N frames) + per-media frame
    byte accounting — the shuffle-free mapInPandas expansion shape.

    The oracle is the closed form of the byte-slice sampler: with
    ``step = max(L // 4, 1)`` the sampler emits ``min(4, L)`` frames
    totalling ``4 * (L // 4)`` bytes for ``L >= 4`` (each of the 4
    slices is exactly ``step`` bytes) and ``L`` single-byte frames
    otherwise."""
    frames = sample_frames(synthesize_media(spark, sf_dir))
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("frame_bytes"),
    )
