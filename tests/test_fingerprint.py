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


def test_audio_seed_arithmetic_safe_across_admitted_domain():
    """r06 VERDICT #2: the seed polynomial must not overflow BIGINT for
    ANY doc_id the loud id-collision guard admits (s < AF_COPY_OFFSET =
    2×10⁹).  Unreduced, DuckDB threw on 37·s² at s ≥ ~5×10⁸ while the
    Python generator computed on with arbitrary precision — an
    asymmetric engine failure.  Both engines now reduce s % AF_MIX_MOD
    before squaring (an exact mod-arithmetic identity); pin the two
    implementations against each other at the domain edge."""
    import duckdb

    from taipei_bi_etl_spark.queries.fingerprint import (
        _AF_BIN_SQL,
        AF_COPY_OFFSET,
        AF_FRAMES,
        AF_MIX_MOD,
    )

    con = duckdb.connect()
    # seeds spanning the admitted domain, incl. the old overflow zone
    # [5×10⁸, 2×10⁹) and the exact guard edge
    seeds = [1, 77, 499_999_999, 500_000_000, 1_234_567_891,
             AF_COPY_OFFSET - 1]
    for s in seeds:
        sr = s % AF_MIX_MOD
        for noisy in (False, True):
            got = con.execute(
                f"SELECT k.k, {_AF_BIN_SQL} FROM (SELECT {s} AS s, "
                f"{noisy} AS noisy), "
                f"LATERAL (SELECT UNNEST(range(0, {AF_FRAMES})) AS k) k "
                "ORDER BY 1"
            ).fetchall()
            want = [
                (k, 5 + ((37 * sr * sr + 13 * k * k + 31 * k * sr + k**3)
                         % AF_MIX_MOD) % 100 + (1 if noisy and k == 3 else 0))
                for k in range(AF_FRAMES)
            ]
            assert got == want, f"seed {s} noisy={noisy}"


def test_phash_incremental_query_matches_full(spark):
    """The registered incremental entry equals the full recompute
    row-for-row (the driver additionally hash-proves it against the
    closed-form oracle — this pins the frame identity locally)."""
    full = {
        (r.media_a, r.media_b, r.hamming)
        for r in REGISTRY["multimodal_phash_dedup"].fn(spark, SF_DIR).collect()
    }
    inc = {
        (r.media_a, r.media_b, r.hamming)
        for r in REGISTRY["multimodal_phash_dedup_incremental"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert full and inc == full
    # the split is non-degenerate: both batches contain images
    from taipei_bi_etl_spark.queries.fingerprint import (
        _phash_is_new,
        phash_hashes,
        phash_media,
    )

    hashes = phash_hashes(phash_media(spark, SF_DIR))
    n_new = hashes.filter(_phash_is_new("media_id")).count()
    n_hist = hashes.filter(~_phash_is_new("media_id")).count()
    assert n_new > 0 and n_hist > 0


def test_phash_index_store_advance_equals_full(spark, tmp_path):
    """Stored-state N-batch advance ≡ full recompute (r06 VERDICT #5):
    init with batch 1, advance with batches 2 and 3 — the union of the
    init-batch self-pairs and the two advances' probe pairs equals the
    all-pairs recompute; history is never re-hashed (each advance sees
    only its own batch's hashes)."""
    from taipei_bi_etl_spark.ivm_store import (
        phash_index_advance,
        phash_index_init,
        read_phash_state,
    )
    from taipei_bi_etl_spark.queries.fingerprint import (
        PHASH_COPY_OFFSET,
        phash_band_index,
        phash_hashes,
        phash_media,
        phash_pairs_from_bands,
    )

    hashes = phash_hashes(phash_media(spark, SF_DIR)).persist()
    base = F.col("media_id") % PHASH_COPY_OFFSET
    # three contiguous base-id ranges (append-only batches)
    cuts = sorted(
        r.b for r in hashes.select(base.alias("b")).distinct().collect()
    )
    c1, c2 = cuts[len(cuts) // 3], cuts[2 * len(cuts) // 3]
    b1 = hashes.filter(base <= c1)
    b2 = hashes.filter((base > c1) & (base <= c2))
    b3 = hashes.filter(base > c2)

    sd = str(tmp_path / "phash_state")
    phash_index_init(spark, b1, sd)
    bands1 = phash_band_index(b1)
    got = {
        (r.media_a, r.media_b, r.hamming)
        for r in phash_pairs_from_bands(bands1, bands1).collect()
    }
    for batch in (b2, b3):
        pairs, _v = phash_index_advance(spark, batch, sd)
        got |= {
            (r.media_a, r.media_b, r.hamming) for r in pairs.collect()
        }
    allbands = phash_band_index(hashes)
    want = {
        (r.media_a, r.media_b, r.hamming)
        for r in phash_pairs_from_bands(allbands, allbands).collect()
    }
    assert want and got == want
    # store bookkeeping advanced
    _idx, watermark, n_images, v = read_phash_state(spark, sd)
    assert v == 3
    assert n_images == hashes.count()

    # append-only contract: replaying batch 3 must fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="append-only"):
        phash_index_advance(spark, b3, sd)
    hashes.unpersist()
