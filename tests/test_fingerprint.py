"""Perceptual fingerprint operators (queries/fingerprint.py): the
planted noisy copies MUST be recovered — the oracle hash-match proves
cross-engine agreement, these tests prove the operators actually find
the duplicates they exist to find."""

from __future__ import annotations

from pyspark.sql import functions as F

from taipei_bi_etl_spark.queries import REGISTRY
from taipei_bi_etl_spark.queries.fingerprint import (
    AF_COPY_OFFSET,
    AF_DUP_MOD,
    PHASH_COPY_OFFSET,
    PHASH_DUP_MOD,
)
from tests.conftest import SF_DIR


def test_phash_finds_every_planted_copy(spark):
    pairs = REGISTRY["multimodal_phash_dedup"].fn(spark, SF_DIR)
    planted = (
        pairs.filter(
            F.col("media_b") == F.col("media_a") + PHASH_COPY_OFFSET
        )
        .select("media_a")
        .collect()
    )
    found = {r.media_a for r in planted}
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    expected = {
        i for i in ids["doc_id"].to_pylist()
        if i % 2 == 0 and i % PHASH_DUP_MOD == 0
    }
    assert expected and found >= expected


def test_audio_fingerprint_finds_every_planted_copy(spark):
    pairs = REGISTRY["multimodal_audio_fingerprint"].fn(spark, SF_DIR)
    planted = (
        pairs.filter(F.col("media_b") == F.col("media_a") + AF_COPY_OFFSET)
        .select("media_a")
        .collect()
    )
    found = {r.media_a for r in planted}
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    expected = {
        i for i in ids["doc_id"].to_pylist() if i % AF_DUP_MOD == 5
    }
    assert expected and found >= expected


def test_phash_hashes_are_bytes(spark):
    # every row-byte is in [0, 255] — the band join relies on 8-bit
    # bands, and the oracle's bit_count comparison on the same range
    from taipei_bi_etl_spark.queries.fingerprint import (
        phash_hashes,
        phash_media,
    )

    h = phash_hashes(phash_media(spark, SF_DIR)).limit(50).collect()
    assert h
    for r in h:
        for j in range(8):
            assert 0 <= r[f"r{j}"] <= 255


def test_video_phash_finds_every_planted_copy(spark):
    from taipei_bi_etl_spark.queries.fingerprint import (
        VID_COPY_OFFSET,
        VID_DUP_MOD,
    )

    pairs = REGISTRY["multimodal_video_phash_dedup"].fn(spark, SF_DIR)
    planted = (
        pairs.filter(F.col("media_b") == F.col("media_a") + VID_COPY_OFFSET)
        .select("media_a")
        .collect()
    )
    found = {r.media_a for r in planted}
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    expected = {
        i for i in ids["doc_id"].to_pylist()
        if i % 4 == 2 and i % (VID_DUP_MOD * 2) == 2
    }
    assert expected and found >= expected
