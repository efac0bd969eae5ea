"""Multimodal plumbing gates: schemas, Arrow batch handling,
determinism, and the fan-out/fan-in shapes — the codec itself is a
deliberate stub (no image libs in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taipei_bi_etl_spark.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    N_FEATURES,
    N_FRAMES,
    extract_features,
    fake_decode,
    resize_meta,
    sample_frames,
    synthesize_media,
)
from tests.conftest import SF_DIR


def test_feature_extract_schema_and_coverage(spark):
    media = synthesize_media(spark, SF_DIR)
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(len(r.features) == N_FEATURES for r in rows)
    # L1-normalized histograms
    assert all(abs(sum(r.features) - 1.0) < 1e-6 for r in rows)


def test_feature_extract_survives_small_arrow_batches(spark):
    # force many small Arrow batches through the same plan
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        media = synthesize_media(spark, SF_DIR)
        small = extract_features(media).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    big = extract_features(synthesize_media(spark, SF_DIR)).collect()
    assert sorted(map(tuple, small)) == sorted(map(tuple, big))


def test_fake_decode_deterministic():
    payload = b"some media payload bytes"
    assert fake_decode(payload) == fake_decode(payload)
    assert fake_decode(b"") == [0.0] * N_FEATURES


def test_frame_sampling_fans_out_video_only(spark):
    media = synthesize_media(spark, SF_DIR)
    frames = sample_frames(media)
    assert frames.schema == FRAME_SCHEMA
    n_video = media.filter(F.col("meta.kind") == "video").count()
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == n_video
    assert all(r["count"] <= N_FRAMES for r in got)
    # frames reassemble a prefix of the payload in index order
    one = frames.orderBy("media_id", "frame_idx").limit(N_FRAMES).collect()
    payload = dict(
        media.select("media_id", "payload").collect()
    )[one[0].media_id]
    joined = b"".join(r.frame for r in one if r.media_id == one[0].media_id)
    assert bytes(payload).startswith(joined)


def test_resize_meta_bounds_and_aspect(spark):
    rows = resize_meta(synthesize_media(spark, SF_DIR), max_side=256).collect()
    for r in rows:
        assert 1 <= r.resized.width <= 256
        assert 1 <= r.resized.height <= 256
        if r.meta.width <= 256 and r.meta.height <= 256:
            assert (r.resized.width, r.resized.height) == (
                r.meta.width,
                r.meta.height,
            )


def test_decode_image_stub_raises_without_pillow():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; stub not exercised")
    except ImportError:
        pass
    from taipei_bi_etl_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
