"""Perceptual fingerprints over REAL decoded media (r05 VERDICT #5/#6).

Closes the missing modalities in the dedup family: text (exact /
n-gram / MinHash / SimHash ✓), embeddings (✓), token blocks (✓) — and
now IMAGES via dHash near-dup and AUDIO via spectral-landmark
fingerprints (`multimodal_audio_fingerprint` below).

`multimodal_phash_dedup` — the image near-dup operator a multimodal
training-data pipeline runs before CLIP-style training:

* media synthesis writes REAL P6 PPM bytes (id-dependent gradient so
  distinct images are perceptually distinct — the plain translate
  lattice of `multimodal.synthesize_real_media` makes every image a
  near-dup of every other, measured 61 504/179 700 pairs within
  radius 7); a deterministic "noisy copy" (+16 on a sparse pixel
  mask) is planted for every DUP_MOD-th image;
* decode + dHash run in ONE Arrow batch pass (`mapInPandas`): parse
  the PPM header/buffer, area-downsample to an 8×9 block-mean grid
  (integer block sums, cross-multiplied mean comparisons — no
  division, no floats), emit 8 row-bytes (64-bit dHash as 8 × 8-bit
  bands);
* candidate pairs come from a PIGEONHOLE-COMPLETE band join (same
  discipline as `dedup_simhash`, queries/dedup.py:360): Hamming ≤ 7
  over 8 bands ⇒ at least one band matches exactly, so the band join
  provably finds every pair the all-pairs oracle finds;
* the DuckDB oracle never sees the bytes: it recomputes the block
  grid from the generating formula (pure integer arithmetic), builds
  the same row-bytes, and takes ALL pairs with bit_count(xor) ≤ 7 —
  a match certifies encode → bytes → decode → hash → join end to end.

100 TB design: the decode+hash pass is embarrassingly parallel (one
narrow 9-column row out per image — bytes never leave the scan task);
the band self-join shuffles 8 rows per image on (band, value) and
candidate volume is bounded by bucket occupancy, never |corpus|²
(measured on the synthetic corpus: 12 415 band-sharing pairs of
179 700 possible at n=600).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taipei_bi_etl_spark.queries import query

if TYPE_CHECKING:
    import pandas as pd

#: every DUP_MOD-th image gets a planted noisy copy at id + COPY_OFFSET.
#: DOMAIN BOUND (enforced loudly in the synthesizers): doc_id must be
#: < COPY_OFFSET or planted-copy ids would collide with real ids.
#: Offsets sit in the BILLIONS (r06: the stress harness replicates
#: docs at +replica·10⁷, which collided with the first-cut 10⁷/2·10⁷
#: offsets — the loud check caught it); at ~66k docs per sf unit the
#: 10⁹ bound holds to ~15,000 sf units of corpus growth.
PHASH_DUP_MOD = 10
PHASH_COPY_OFFSET = 1_000_000_000
PHASH_RADIUS = 7  # ≤ 7 over 8 bands: pigeonhole-complete band join

#: per-channel pixel value — the SINGLE source of truth, transcribed
#: identically in the numpy encoder and the SQL oracle below.
#:   v(c,x,y,s) = (3x(1+s%5) + 5y(1+s%7) + 7c + s + 16((x(1+s%11)+y)%13)) % 256
#: noisy copy: each channel (v+16) % 256 where (x+y) % 37 == 0.


def _phash_pixels_sql(noisy: str, seed: str = "s") -> str:
    """Channel-summed gray value at (x, y) for seed expr ``seed`` —
    ``noisy`` is a SQL boolean expr selecting the planted-copy
    perturbation.  (``seed`` differs from the sizing seed ``s`` for
    the video frames, whose w×h is fixed per video while the pixel
    content evolves per frame.)"""
    t = f"({seed})"
    chans = []
    for c in (0, 1, 2):
        v = (
            f"((3*x*(1 + {t}%5) + 5*y*(1 + {t}%7) + {7 * c} + {t}"
            f" + 16*((x*(1 + {t}%11) + y) % 13)) % 256)"
        )
        chans.append(
            f"CASE WHEN {noisy} AND (x + y) % 37 = 0 "
            f"THEN ({v} + 16) % 256 ELSE {v} END"
        )
    return " + ".join(chans)


_PHASH_ORACLE = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS s, FALSE AS noisy FROM documents
  WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + {PHASH_COPY_OFFSET}, doc_id, TRUE FROM documents
  WHERE doc_id % 2 = 0 AND doc_id % {PHASH_DUP_MOD} = 0
), px AS (
  SELECT media_id,
         (x.x * 9) // (16 + s % 17) AS gx,
         (y.y * 8) // (12 + s % 13) AS gy,
         {_phash_pixels_sql("noisy")} AS gray
  FROM ids,
       LATERAL (SELECT UNNEST(range(0, 16 + s % 17)) AS x) x,
       LATERAL (SELECT UNNEST(range(0, 12 + s % 13)) AS y) y
), blocks AS (
  SELECT media_id, gy, gx,
         CAST(SUM(gray) AS BIGINT) AS bs,
         CAST(COUNT(*) AS BIGINT) AS bn
  FROM px GROUP BY 1, 2, 3
), bits AS (
  -- cross-multiplied mean comparison: mean(gx) > mean(gx+1)
  SELECT a.media_id, a.gy, a.gx,
         CASE WHEN a.bs * b.bn > b.bs * a.bn THEN 1 ELSE 0 END AS bit
  FROM blocks a JOIN blocks b
    ON b.media_id = a.media_id AND b.gy = a.gy AND b.gx = a.gx + 1
  WHERE a.gx < 8
), rows_ AS (
  SELECT media_id, gy,
         CAST(SUM(bit << CAST(gx AS INT)) AS BIGINT) AS rb
  FROM bits GROUP BY 1, 2
), hashes AS (
  SELECT media_id,
         MAX(CASE WHEN gy = 0 THEN rb END) AS r0,
         MAX(CASE WHEN gy = 1 THEN rb END) AS r1,
         MAX(CASE WHEN gy = 2 THEN rb END) AS r2,
         MAX(CASE WHEN gy = 3 THEN rb END) AS r3,
         MAX(CASE WHEN gy = 4 THEN rb END) AS r4,
         MAX(CASE WHEN gy = 5 THEN rb END) AS r5,
         MAX(CASE WHEN gy = 6 THEN rb END) AS r6,
         MAX(CASE WHEN gy = 7 THEN rb END) AS r7
  FROM rows_ GROUP BY 1
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.r0, b.r0)) + bit_count(xor(a.r1, b.r1))
          + bit_count(xor(a.r2, b.r2)) + bit_count(xor(a.r3, b.r3))
          + bit_count(xor(a.r4, b.r4)) + bit_count(xor(a.r5, b.r5))
          + bit_count(xor(a.r6, b.r6)) + bit_count(xor(a.r7, b.r7))
            AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.r0, b.r0)) + bit_count(xor(a.r1, b.r1))
    + bit_count(xor(a.r2, b.r2)) + bit_count(xor(a.r3, b.r3))
    + bit_count(xor(a.r4, b.r4)) + bit_count(xor(a.r5, b.r5))
    + bit_count(xor(a.r6, b.r6)) + bit_count(xor(a.r7, b.r7))
   <= {PHASH_RADIUS}
"""


def phash_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL P6 PPM payloads for the phash corpus: id-dependent gradient
    images for every even doc_id, plus a planted noisy copy for every
    ``PHASH_DUP_MOD``-th one.  Distributed, Arrow-batched, numpy."""
    from taipei_bi_etl_spark.io import read_table

    ids = read_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 2 == 0
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    dup_mod, offset = PHASH_DUP_MOD, PHASH_COPY_OFFSET

    # SELF-CONTAINED closure (SKILL gotcha: workers cannot import the
    # package when the driver runs from a foreign cwd).
    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def ppm_for(s: int, noisy: bool) -> bytes:
            w, h = 16 + s % 17, 12 + s % 13
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            pix = (
                3 * x * (1 + s % 5) + 5 * y * (1 + s % 7) + 7 * c + s
                + 16 * ((x * (1 + s % 11) + y) % 13)
            ) % 256
            if noisy:
                mask = (
                    (np.arange(w)[None, :] + np.arange(h)[:, None]) % 37 == 0
                )
                pix = np.where(mask[:, :, None], (pix + 16) % 256, pix)
            return (
                f"P6\n{w} {h}\n255\n".encode()
                + pix.astype(np.uint8).tobytes()
            )

        for pdf in batches:
            mids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                if i >= offset:
                    raise ValueError(
                        f"doc_id {i} >= copy offset {offset}: planted-"
                        "copy ids would collide with real ids (raise "
                        "PHASH_COPY_OFFSET for this corpus)"
                    )
                mids.append(i)
                payloads.append(ppm_for(i, False))
                if i % dup_mod == 0:
                    mids.append(i + offset)
                    payloads.append(ppm_for(i, True))
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    return ids.mapInPandas(gen, schema=out_schema)


def phash_hashes(media: DataFrame) -> DataFrame:
    """Decode PPM bytes → 8×9 block-mean grid → dHash row-bytes, one
    Arrow pass; output is one narrow 9-column row per image."""
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [T.StructField(f"r{j}", T.LongType()) for j in range(8)]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def dhash(payload: bytes):
            if not bytes(payload).startswith(b"P6"):
                raise ValueError("not a P6 PPM")
            parts = bytes(payload).split(b"\n", 3)
            w, h = (int(v) for v in parts[1].split())
            pix = np.frombuffer(
                parts[3][: w * h * 3], dtype=np.uint8
            ).reshape(h, w, 3)
            gray = pix.sum(axis=2, dtype=np.int64)
            gx = (np.arange(w) * 9) // w
            gy = (np.arange(h) * 8) // h
            S = np.zeros((8, 9), dtype=np.int64)
            N = np.zeros((8, 9), dtype=np.int64)
            np.add.at(S, (gy[:, None].repeat(w, 1), gx[None, :].repeat(h, 0)), gray)
            np.add.at(N, (gy[:, None].repeat(w, 1), gx[None, :].repeat(h, 0)), 1)
            out = []
            for r in range(8):
                b = 0
                for g in range(8):
                    # integer cross-multiplied mean comparison — exact,
                    # transcribed identically in the oracle's bits CTE
                    if S[r, g] * N[r, g + 1] > S[r, g + 1] * N[r, g]:
                        b |= 1 << g
                out.append(b)
            return out

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows.append([int(mid)] + dhash(payload))
            yield pd.DataFrame(
                rows, columns=["media_id"] + [f"r{j}" for j in range(8)]
            )

    return media.mapInPandas(run, schema=schema)


def phash_band_index(hashes: DataFrame) -> DataFrame:
    """8 (band, val) rows per image alongside the full row-bytes — the
    persistable band index (:mod:`ivm_store` stores exactly this frame,
    bucketable on (band, val) in production so incremental probes
    co-locate without shuffling history)."""
    return hashes.select(
        "media_id",
        *[f"r{j}" for j in range(8)],
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"), F.col(f"r{j}").alias("val")
                )
                for j in range(8)
            ])
        ).alias("bd"),
    ).select(
        "media_id", *[f"r{j}" for j in range(8)],
        F.col("bd.band").alias("band"), F.col("bd.val").alias("val"),
    )


def phash_pairs_from_bands(
    probe: DataFrame, index: DataFrame
) -> DataFrame:
    """Hamming-≤-radius pairs from a band probe: every pair with at
    least one side in ``probe`` and the other in ``index`` (pass the
    same frame twice for the full self-join).  Pigeonhole-complete:
    two hashes within Hamming {PHASH_RADIUS} ≤ 7 agree exactly on ≥ 1
    of 8 bands, so the equi-join on (band, val) misses nothing."""
    a = probe.select(
        F.col("media_id").alias("media_a"), "band", "val",
        *[F.col(f"r{j}").alias(f"a{j}") for j in range(8)],
    )
    b = index.select(
        F.col("media_id").alias("media_b"), "band", "val",
        *[F.col(f"r{j}").alias(f"b{j}") for j in range(8)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"b{j}")))
        for j in range(8)
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("media_a") != F.col("media_b"))
        .select(
            F.least("media_a", "media_b").alias("lo"),
            F.greatest("media_a", "media_b").alias("hi"),
            hamming.cast("long").alias("hamming"),
        )
    )
    return (
        cand.select(
            F.col("lo").alias("media_a"),
            F.col("hi").alias("media_b"),
            "hamming",
        )
        .filter(F.col("hamming") <= PHASH_RADIUS)
        .distinct()
    )


@query(
    "multimodal_phash_dedup",
    oracle=_PHASH_ORACLE,
    tags=("multimodal", "dedup", "extension"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs under dHash Hamming ≤ {PHASH_RADIUS}, via a
    pigeonhole-complete band self-join over REAL decoded PPM bytes
    (module docstring has the full design + measured selectivity).

    Precondition: doc_id ≥ 0 (generator contract — the %-arithmetic
    sign convention differs between numpy and SQL on negatives)."""
    hashes = phash_hashes(phash_media(spark, sf_dir)).persist()
    bands = phash_band_index(hashes)
    return phash_pairs_from_bands(bands, bands)


#: Incremental batch split (r06 VERDICT #5): an image is in the NEW
#: batch iff ((base doc_id)/2) % 4 == 3 (~25% of the corpus).  The
#: planted copy at +PHASH_COPY_OFFSET lands in the SAME batch as its
#: base (the offset is divisible by 8), so both new-vs-new and
#: new-vs-history planted pairs occur.
def _phash_is_new(media_id) -> "F.Column":
    base = F.col(media_id) % PHASH_COPY_OFFSET
    return (base / 2).cast("long") % 4 == 3


@query(
    "multimodal_phash_dedup_incremental",
    oracle=_PHASH_ORACLE,
    tags=("multimodal", "dedup", "ivm", "extension"),
)
def multimodal_phash_dedup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental image dedup against a persisted band index (r06
    VERDICT #5 — the image twin of the text family's
    ``dedup.dedup_incremental``): history images are hashed ONCE into
    the 8-band index; a new batch hashes only itself and probes the
    index, so daily cost is ∝ |batch| + matched band buckets, never
    |history| (in production the index is written bucketed on
    (band, val) — :func:`ivm_store.phash_index_advance` is the
    stored-state form, proven equivalent in pytest).

    IVM identity, hash-proven by the driver gate (the
    ``cohort_retention_incremental`` pattern): the ORACLE is the FULL
    all-pairs recompute, while this plan computes
    ``pairs(history) ∪ probe(new, index(history) ∪ index(new))`` —
    equality holds because the band join is pigeonhole-complete and
    every pair has a side ordering, so the union covers
    history×history (yesterday's answer), new×history and new×new
    (today's delta) exactly once after the normalize+distinct (r08:
    plumbing via the shared `incremental.incremental_pairs`
    scaffold)."""
    from taipei_bi_etl_spark.queries.incremental import incremental_pairs

    hashes = phash_hashes(phash_media(spark, sf_dir)).persist()
    return incremental_pairs(
        hashes.filter(~_phash_is_new("media_id")),
        hashes.filter(_phash_is_new("media_id")),
        phash_band_index,
        phash_pairs_from_bands,
    )


# ---------------------------------------------------------------------------
# Audio fingerprint (r05 VERDICT #6): spectral-peak landmarks → hashed
# (bin_t, bin_t+1) pairs → exact-match join — the Shazam-shaped
# operator for near-dup audio in a multimodal corpus.
# ---------------------------------------------------------------------------

AF_FRAMES = 16          # frames per track
AF_FRAME_LEN = 256      # samples per frame → rfft bins 0..128
AF_SR = 8000
AF_AMP = 9000
AF_COPY_OFFSET = 2_000_000_000
AF_DUP_MOD = 10         # doc_id % 10 == 5 (odd multiples of 5) get a copy
AF_MATCH_MIN = 10       # landmark matches ≥ 10 ⇒ duplicate pair
AF_MIX_MOD = 999983     # large prime ≫ max doc_id: no seed aliasing

#: frame k of seed s is a pure sine EXACTLY on rfft bin
#:   b(s,k) = 5 + ((37·sr² + 13k² + 31k·sr + k³) % AF_MIX_MOD) % 100
#:   where sr = s % AF_MIX_MOD
#: (periodic over the frame ⇒ the FFT magnitude peak is exactly at b —
#: int16 rounding sidelobes are orders of magnitude below the peak;
#: verified numerically incl. the 0.8-amplitude copies).  The planted
#: copy detunes ONLY frame k=3 by +1 bin (an "edited re-encode"),
#: losing 2 of the 15 landmarks → 13 matches vs threshold 10; measured
#: natural coincidence tail at n=1000 tracks: 3 pairs ≥ 10, max 13.
#:
#: LOUD-DOMAIN ARITHMETIC (r06 VERDICT #2): the seed is reduced mod
#: AF_MIX_MOD BEFORE squaring in BOTH engines — an exact identity
#: ((37s²+31ks) ≡ (37·sr²+31k·sr) mod m), and it keeps every
#: intermediate < 37·10¹² ≪ int64 for ALL s below AF_COPY_OFFSET.
#: Unreduced, DuckDB's BIGINT 37·s² overflows (throws) at s ≥ ~5×10⁸
#: while Python computes on with arbitrary precision — an asymmetric
#: failure inside the id-collision guard's admitted domain.  The
#: phash/video pixel polynomials are LINEAR in the seed (max term
#: s + 16·12 < 2×10⁹ + 2⁸) so the id guard alone bounds them.

_AF_BIN_SQL = (
    "5 + ((37*(CAST(s AS BIGINT) % {mod})*(CAST(s AS BIGINT) % {mod})"
    " + 13*k*k + 31*k*(CAST(s AS BIGINT) % {mod})"
    " + k*k*k) % {mod}) % 100"
    " + CASE WHEN noisy AND k = 3 THEN 1 ELSE 0 END"
).format(mod=AF_MIX_MOD)

_AF_ORACLE = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS s, FALSE AS noisy FROM documents
  WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {AF_COPY_OFFSET}, doc_id, TRUE FROM documents
  WHERE doc_id % {AF_DUP_MOD} = 5
), frames AS (
  SELECT media_id, k.k, {_AF_BIN_SQL} AS bin
  FROM ids, LATERAL (SELECT UNNEST(range(0, {AF_FRAMES})) AS k) k
), lm AS (
  SELECT DISTINCT media_id, bin AS b1,
         LEAD(bin) OVER (PARTITION BY media_id ORDER BY k) AS b2
  FROM frames
  QUALIFY b2 IS NOT NULL
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(COUNT(*) AS BIGINT) AS n_matches
FROM lm a JOIN lm b ON a.b1 = b.b1 AND a.b2 = b.b2
                   AND a.media_id < b.media_id
GROUP BY 1, 2
HAVING COUNT(*) >= {AF_MATCH_MIN}
"""


def audio_fingerprint_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE PCM16 payloads: 16-frame multi-tone tracks for
    every odd doc_id, plus a detuned 0.8-amplitude copy for every
    ``AF_DUP_MOD``-th one."""
    from taipei_bi_etl_spark.io import read_table

    ids = read_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 2 == 1
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    nf, fl, sr, amp = AF_FRAMES, AF_FRAME_LEN, AF_SR, AF_AMP
    offset, mixmod, dup_mod = AF_COPY_OFFSET, AF_MIX_MOD, AF_DUP_MOD

    # SELF-CONTAINED closure (foreign-cwd driver: workers cannot
    # import the package).
    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def wav_for(s: int, noisy: bool) -> bytes:
            a = int(amp * 0.8) if noisy else amp
            frames = []
            sr = s % mixmod  # reduce BEFORE squaring (see _AF_BIN_SQL)
            for k in range(nf):
                b = 5 + ((37 * sr * sr + 13 * k * k + 31 * k * sr + k**3) % mixmod) % 100
                if noisy and k == 3:
                    b += 1
                t = np.arange(fl)
                frames.append(
                    np.round(a * np.sin(2 * np.pi * b * t / fl)).astype("<i2")
                )
            data = np.concatenate(frames).tobytes()
            hdr = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
                1, 1, sr, sr * 2, 2, 16, b"data", len(data),
            )
            return hdr + data

        for pdf in batches:
            mids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                if i >= offset:
                    raise ValueError(
                        f"doc_id {i} >= copy offset {offset}: planted-"
                        "copy ids would collide with real ids (raise "
                        "AF_COPY_OFFSET for this corpus)"
                    )
                mids.append(i)
                payloads.append(wav_for(i, False))
                if i % dup_mod == 5:
                    mids.append(i + offset)
                    payloads.append(wav_for(i, True))
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    return ids.mapInPandas(gen, schema=out_schema)


def audio_peak_bins(media: DataFrame) -> DataFrame:
    """Decode WAV bytes → per-frame rfft argmax bin, one Arrow pass."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("k", T.IntegerType(), False),
            T.StructField("bin", T.IntegerType(), False),
        ]
    )
    nf, fl = AF_FRAMES, AF_FRAME_LEN

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def peaks(payload: bytes):
            payload = bytes(payload)
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            pos, data = 12, None
            while pos + 8 <= len(payload):
                cid, size = struct.unpack_from("<4sI", payload, pos)
                if cid == b"data":
                    data = np.frombuffer(
                        payload[pos + 8 : pos + 8 + size], dtype="<i2"
                    )
                pos += 8 + size + (size & 1)
            if data is None or len(data) != nf * fl:
                raise ValueError("bad data chunk")
            sig = data.astype(np.float64).reshape(nf, fl)
            return np.abs(np.fft.rfft(sig, axis=1)).argmax(axis=1)

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for k, b in enumerate(peaks(payload)):
                    rows.append((int(mid), k, int(b)))
            yield pd.DataFrame(rows, columns=["media_id", "k", "bin"])

    return media.mapInPandas(run, schema=schema)


@query(
    "multimodal_audio_fingerprint",
    oracle=_AF_ORACLE,
    tags=("multimodal", "dedup", "extension"),
)
def multimodal_audio_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup audio pairs by spectral-landmark fingerprint: REAL WAV
    decode → per-frame FFT peak bins → consecutive-peak landmarks →
    exact-match equi-join → pairs with ≥ {AF_MATCH_MIN} shared
    landmarks.  The oracle recomputes the peak bins CLOSED-FORM (the
    synthesis puts each frame's sine exactly on an rfft bin), so a
    hash match certifies encode → bytes → decode → FFT → join.

    100 TB design: decode+FFT is map-side (one narrow row per frame);
    the landmark join shuffles 15 rows per track on (b1, b2) — an
    exact-match inverted index, candidates bounded by landmark-bucket
    occupancy exactly like the text shingle index, never |corpus|².

    Precondition: doc_id ≥ 0 (generator %-sign convention)."""
    from pyspark.sql import Window as W

    bins_df = audio_peak_bins(audio_fingerprint_media(spark, sf_dir))
    w = W.partitionBy("media_id").orderBy("k")
    lm = (
        bins_df.select(
            "media_id",
            F.col("bin").alias("b1"),
            F.lead("bin").over(w).alias("b2"),
        )
        .filter(F.col("b2").isNotNull())
        .distinct()
        .persist()
    )
    a = lm.select(F.col("media_id").alias("media_a"), "b1", "b2")
    b = lm.select(F.col("media_id").alias("media_b"), "b1", "b2")
    return (
        a.join(b, ["b1", "b2"])
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
        .filter(F.col("n_matches") >= AF_MATCH_MIN)
    )


# ---------------------------------------------------------------------------
# Video fingerprint (r06): per-frame dHash sequences, temporally
# aligned row-byte matches — completes the modality set (text ✓,
# embedding ✓, token-block ✓, image ✓, audio ✓, video ✓).
# ---------------------------------------------------------------------------

VID_FRAMES = 6
VID_FRAME_SEED = 1009      # per-frame pixel-seed stride
VID_COPY_OFFSET = 3_000_000_000
VID_DUP_MOD = 10           # doc_id % 20 == 2 gets a planted copy
VID_ROW_MATCH = 5          # ≥5 of 8 row-bytes equal ⇒ the frame matches
VID_FRAME_MATCH = 5        # ≥5 of 6 aligned frames ⇒ duplicate pair

#: frame f of video s reuses the image formula with pixel seed
#: s + VID_FRAME_SEED·f while w×h stay sized by s (fixed-stride
#: container).  ROW_MATCH = 5 (r06 stress fix): with ≥5 of 8 rows
#: equal, at least one of the 4 DISJOINT row pairs {(0,1)..(6,7)} is
#: fully equal (pigeonhole), so candidates come from a 16-bit
#: pair-key inverted index instead of the 8-bit single-row key whose
#: 256-value alphabet made bucket occupancy quadratic (measured
#: K=4 stress ratio 5.95 → the pair index cuts Σsize² 10×).
#: Measured at n=600: planted copies match 6/6 frames (the sparse
#: noise never degrades 4+ distinct rows), natural pairs ≤2.

_VID_ORACLE = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS s, FALSE AS noisy FROM documents
  WHERE doc_id % 4 = 2
  UNION ALL
  SELECT doc_id + {VID_COPY_OFFSET}, doc_id, TRUE FROM documents
  WHERE doc_id % 4 = 2 AND doc_id % {VID_DUP_MOD * 2} = 2
), px AS (
  SELECT media_id, f.f,
         (x.x * 9) // (16 + s % 17) AS gx,
         (y.y * 8) // (12 + s % 13) AS gy,
         {_phash_pixels_sql("noisy", seed=f"s + {VID_FRAME_SEED} * f.f")} AS gray
  FROM ids,
       LATERAL (SELECT UNNEST(range(0, {VID_FRAMES})) AS f) f,
       LATERAL (SELECT UNNEST(range(0, 16 + s % 17)) AS x) x,
       LATERAL (SELECT UNNEST(range(0, 12 + s % 13)) AS y) y
), blocks AS (
  SELECT media_id, f, gy, gx,
         CAST(SUM(gray) AS BIGINT) AS bs,
         CAST(COUNT(*) AS BIGINT) AS bn
  FROM px GROUP BY 1, 2, 3, 4
), bits AS (
  SELECT a.media_id, a.f, a.gy, a.gx,
         CASE WHEN a.bs * b.bn > b.bs * a.bn THEN 1 ELSE 0 END AS bit
  FROM blocks a JOIN blocks b
    ON b.media_id = a.media_id AND b.f = a.f AND b.gy = a.gy
   AND b.gx = a.gx + 1
  WHERE a.gx < 8
), rows_ AS (
  SELECT media_id, f, gy,
         CAST(SUM(bit << CAST(gx AS INT)) AS BIGINT) AS rb
  FROM bits GROUP BY 1, 2, 3
), rowmatch AS (
  -- oracle side: exact single-row count (all-pairs semantics); the
  -- Spark side reaches the same set through the pigeonhole-complete
  -- pair-key index
  SELECT a.media_id AS media_a, b.media_id AS media_b, a.f,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM rows_ a JOIN rows_ b
    ON b.f = a.f AND b.gy = a.gy AND b.rb = a.rb
   AND a.media_id < b.media_id
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= {VID_ROW_MATCH}
)
SELECT media_a, media_b,
       CAST(COUNT(*) AS BIGINT) AS n_frames_matched
FROM rowmatch GROUP BY 1, 2
HAVING COUNT(*) >= {VID_FRAME_MATCH}
"""


def video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL fixed-stride video containers: ``VID0\\n<n> <w> <h>\\n``
    header + n raw RGB frames; every ``doc_id % 4 == 2`` document gets
    a video, every other one of those a planted noisy copy."""
    from taipei_bi_etl_spark.io import read_table

    ids = read_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 2
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    nf, stride = VID_FRAMES, VID_FRAME_SEED
    offset, dup2 = VID_COPY_OFFSET, VID_DUP_MOD * 2

    # SELF-CONTAINED closure (foreign-cwd driver discipline)
    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def frame(s: int, f: int, noisy: bool, w: int, h: int):
            sf = s + stride * f
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            pix = (
                3 * x * (1 + sf % 5) + 5 * y * (1 + sf % 7) + 7 * c + sf
                + 16 * ((x * (1 + sf % 11) + y) % 13)
            ) % 256
            if noisy:
                mask = (
                    (np.arange(w)[None, :] + np.arange(h)[:, None]) % 37 == 0
                )
                pix = np.where(mask[:, :, None], (pix + 16) % 256, pix)
            return pix.astype(np.uint8)

        def vid_for(s: int, noisy: bool) -> bytes:
            w, h = 16 + s % 17, 12 + s % 13
            frames = b"".join(
                frame(s, f, noisy, w, h).tobytes() for f in range(nf)
            )
            return f"VID0\n{nf} {w} {h}\n".encode() + frames

        for pdf in batches:
            mids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                if i >= offset:
                    raise ValueError(
                        f"doc_id {i} >= copy offset {offset}: planted-"
                        "copy ids would collide with real ids"
                    )
                mids.append(i)
                payloads.append(vid_for(i, False))
                if i % dup2 == 2:
                    mids.append(i + offset)
                    payloads.append(vid_for(i, True))
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    return ids.mapInPandas(gen, schema=out_schema)


def video_frame_hashes(media: DataFrame) -> DataFrame:
    """Decode the container → per-frame dHash: one row per
    (media_id, frame) carrying the 8 row-bytes."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("f", T.IntegerType(), False),
        ]
        + [T.StructField(f"r{j}", T.LongType(), False) for j in range(8)]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def rows_for(payload: bytes):
            payload = bytes(payload)
            if not payload.startswith(b"VID0\n"):
                raise ValueError("not a VID0 container")
            _, body = payload.split(b"\n", 1)
            meta, body = body.split(b"\n", 1)
            n, w, h = (int(v) for v in meta.split())
            need = n * h * w * 3
            if len(body) < need:
                raise ValueError("truncated video payload")
            pix = np.frombuffer(body[:need], dtype=np.uint8).reshape(
                n, h, w, 3
            )
            gray = pix.sum(axis=3, dtype=np.int64)  # (n, h, w)
            gx = (np.arange(w) * 9) // w
            gy = (np.arange(h) * 8) // h
            out = []
            for f in range(n):
                S = np.zeros((8, 9), dtype=np.int64)
                N = np.zeros((8, 9), dtype=np.int64)
                np.add.at(
                    S,
                    (gy[:, None].repeat(w, 1), gx[None, :].repeat(h, 0)),
                    gray[f],
                )
                np.add.at(
                    N,
                    (gy[:, None].repeat(w, 1), gx[None, :].repeat(h, 0)),
                    1,
                )
                rbs = []
                for r in range(8):
                    b = 0
                    for g in range(8):
                        if S[r, g] * N[r, g + 1] > S[r, g + 1] * N[r, g]:
                            b |= 1 << g
                    rbs.append(b)
                out.append((f, rbs))
            return out

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for f, rbs in rows_for(payload):
                    rows.append([int(mid), f] + rbs)
            yield pd.DataFrame(
                rows,
                columns=["media_id", "f"] + [f"r{j}" for j in range(8)],
            )

    return media.mapInPandas(run, schema=schema)


@query(
    "multimodal_video_phash_dedup",
    oracle=_VID_ORACLE,
    tags=("multimodal", "dedup", "extension"),
)
def multimodal_video_phash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temporally-aligned video near-dup: REAL container decode →
    per-frame dHash → exact row-byte inverted-index join keyed on
    (frame, row, byte) → a pair is a duplicate when ≥{VID_ROW_MATCH}
    of 8 row-bytes match on ≥{VID_FRAME_MATCH} of {VID_FRAMES} aligned
    frames.  The pigeonhole argument guarantees candidate
    COMPLETENESS (≥5 equal rows ⇒ one disjoint pair fully equal, so
    the pair index finds every qualifying frame); planted-copy
    RECOVERY is empirical, not proven — the sparse noise flips ≤4
    dHash bits per frame, which GUARANTEES only ≥4 intact rows, one
    short of the threshold; measured at n=600 the noise never
    degrades 4 distinct rows and copies match 6/6 frames with ≥5-of-6
    slack, while natural pairs align ≤2 frames.

    100 TB: decode+hash is map-side (48 narrow rows per video); the
    join shuffles on the (frame, row, byte) inverted index — candidate
    volume is bucket-bounded like every other fingerprint family.

    Precondition: doc_id ≥ 0 and < VID_COPY_OFFSET (checked loudly)."""
    hashes = video_frame_hashes(video_media(spark, sf_dir)).persist()
    # pigeonhole-complete candidate index: ≥5 of 8 equal rows ⇒ one of
    # the 4 DISJOINT row pairs fully equal, so explode 4 16-bit pair
    # keys per frame and equi-join on (f, pair, pval)
    bands = hashes.select(
        "media_id", "f", *[f"r{j}" for j in range(8)],
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(p).alias("pair"),
                    (F.col(f"r{2 * p}") * 256 + F.col(f"r{2 * p + 1}"))
                    .alias("pval"),
                )
                for p in range(4)
            ])
        ).alias("bd"),
    ).select(
        "media_id", "f", *[f"r{j}" for j in range(8)],
        F.col("bd.pair").alias("pair"), F.col("bd.pval").alias("pval"),
    )
    a = bands.select(
        F.col("media_id").alias("media_a"), "f", "pair", "pval",
        *[F.col(f"r{j}").alias(f"a{j}") for j in range(8)],
    )
    b = bands.select(
        F.col("media_id").alias("media_b"), "f", "pair", "pval",
        *[F.col(f"r{j}").alias(f"b{j}") for j in range(8)],
    )
    n_eq = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(8)
    )
    rowmatch = (
        a.join(b, ["f", "pair", "pval"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "f", n_eq.alias("n_rows"))
        .filter(F.col("n_rows") >= VID_ROW_MATCH)
        .select("media_a", "media_b", "f")
        .distinct()
    )
    return (
        rowmatch.groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_frames_matched"))
        .filter(F.col("n_frames_matched") >= VID_FRAME_MATCH)
    )


# ---------------------------------------------------------------------------
# Video scene-cut detection (r07): the temporal-segmentation half of
# video preprocessing — a training pipeline samples frames PER SCENE,
# so cut detection runs before frame sampling.  Frames within a scene
# are identical by construction (seed = s + stride·(f // SCENE_LEN)),
# cuts occur at scene boundaries; detection = per-frame dHash Hamming
# against the previous frame.
# ---------------------------------------------------------------------------

SCENE_LEN = 3           # frames per scene in the synthetic corpus
SCENE_FRAMES = 9        # frames per video (3 scenes)
SCENE_CUT_T = 1         # hamming ≥ 1 vs previous frame ⇒ cut

_SCENE_ORACLE = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS s FROM documents
  WHERE doc_id % 4 = 2
), px AS (
  SELECT media_id, f.f,
         (x.x * 9) // (16 + s % 17) AS gx,
         (y.y * 8) // (12 + s % 13) AS gy,
         {_phash_pixels_sql("FALSE", seed=f"s + {VID_FRAME_SEED} * (f.f // {SCENE_LEN})")} AS gray
  FROM ids,
       LATERAL (SELECT UNNEST(range(0, {SCENE_FRAMES})) AS f) f,
       LATERAL (SELECT UNNEST(range(0, 16 + s % 17)) AS x) x,
       LATERAL (SELECT UNNEST(range(0, 12 + s % 13)) AS y) y
), blocks AS (
  SELECT media_id, f, gy, gx,
         CAST(SUM(gray) AS BIGINT) AS bs,
         CAST(COUNT(*) AS BIGINT) AS bn
  FROM px GROUP BY 1, 2, 3, 4
), bits AS (
  SELECT a.media_id, a.f, a.gy, a.gx,
         CASE WHEN a.bs * b.bn > b.bs * a.bn THEN 1 ELSE 0 END AS bit
  FROM blocks a JOIN blocks b
    ON b.media_id = a.media_id AND b.f = a.f AND b.gy = a.gy
   AND b.gx = a.gx + 1
  WHERE a.gx < 8
), rows_ AS (
  SELECT media_id, f, gy,
         CAST(SUM(bit << CAST(gx AS INT)) AS BIGINT) AS rb
  FROM bits GROUP BY 1, 2, 3
), diffs AS (
  SELECT a.media_id, a.f,
         CAST(SUM(bit_count(xor(a.rb, b.rb))) AS BIGINT) AS hamming
  FROM rows_ a JOIN rows_ b
    ON b.media_id = a.media_id AND b.gy = a.gy AND b.f = a.f - 1
  WHERE a.f >= 1
  GROUP BY 1, 2
)
SELECT media_id,
       CAST({SCENE_FRAMES} AS INT) AS n_frames,
       CAST(COUNT(CASE WHEN hamming >= {SCENE_CUT_T} THEN 1 END) AS INT)
         AS n_cuts,
       COALESCE(array_to_string(
           list_sort(list(CAST(f AS VARCHAR))
                     FILTER (WHERE hamming >= {SCENE_CUT_T})), ','), '')
         AS cut_frames_csv,
       CAST(MAX(hamming) AS BIGINT) AS max_hamming
FROM diffs GROUP BY 1
"""


def scene_video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-structured containers: {SCENE_FRAMES} frames, the pixel
    seed advances only every {SCENE_LEN} frames (identical frames
    within a scene, a content change at each boundary)."""
    from taipei_bi_etl_spark.io import read_table

    ids = read_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 2
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    nf, stride, scene = SCENE_FRAMES, VID_FRAME_SEED, SCENE_LEN

    # SELF-CONTAINED closure (foreign-cwd driver discipline)
    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def frame(s: int, f: int, w: int, h: int):
            sf = s + stride * (f // scene)
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            pix = (
                3 * x * (1 + sf % 5) + 5 * y * (1 + sf % 7) + 7 * c + sf
                + 16 * ((x * (1 + sf % 11) + y) % 13)
            ) % 256
            return pix.astype(np.uint8)

        for pdf in batches:
            mids, payloads = [], []
            for i in pdf["doc_id"]:
                s = int(i)
                w, h = 16 + s % 17, 12 + s % 13
                frames = b"".join(
                    frame(s, f, w, h).tobytes() for f in range(nf)
                )
                mids.append(s)
                payloads.append(f"VID0\n{nf} {w} {h}\n".encode() + frames)
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    return ids.mapInPandas(gen, schema=out_schema)


@query(
    "multimodal_video_scene_cuts",
    oracle=_SCENE_ORACLE,
    tags=("multimodal", "extension"),
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL decoded containers: per-frame
    dHash (the same decode kernel as the dedup family), Hamming vs the
    previous frame via a self-join on (media_id, f-1), a frame with
    hamming ≥ {SCENE_CUT_T} is a cut.  Output per video: frame count,
    cut count, the cut-frame list, and the max inter-frame distance.

    The closed-form oracle recomputes the whole chain (grid → dHash →
    consecutive Hamming) from the id arithmetic, so the driver hash
    certifies encode → decode → hash → temporal diff end to end.

    100 TB: decode+hash is map-side; the only shuffles are the
    per-video (media_id) consecutive-frame join and the final rollup —
    both keyed on media_id, no cross-video work at all.

    Note: a cut is MISSED if two adjacent scenes hash identically
    (inherent to hash-based detection and identically computed by both
    engines); within-scene frames are byte-identical so hamming is
    exactly 0 there."""
    hashes = video_frame_hashes(scene_video_media(spark, sf_dir)).persist()
    prev = hashes.select(
        "media_id",
        (F.col("f") + 1).alias("f"),
        *[F.col(f"r{j}").alias(f"p{j}") for j in range(8)],
    )
    ham = sum(
        F.bit_count(F.col(f"r{j}").bitwiseXOR(F.col(f"p{j}")))
        for j in range(8)
    )
    diffs = (
        hashes.join(prev, ["media_id", "f"])
        .select("media_id", "f", ham.cast("long").alias("hamming"))
    )
    return diffs.groupBy("media_id").agg(
        F.lit(SCENE_FRAMES).cast("int").alias("n_frames"),
        F.count(F.when(F.col("hamming") >= SCENE_CUT_T, 1))
        .cast("int")
        .alias("n_cuts"),
        F.coalesce(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("hamming") >= SCENE_CUT_T,
                            F.col("f").cast("string"),
                        )
                    )
                ),
                ",",
            ),
            F.lit(""),
        ).alias("cut_frames_csv"),
        F.max("hamming").alias("max_hamming"),
    )


# ---------------------------------------------------------------------------
# Audio activity segmentation (r07): the VAD-shaped preprocessing step
# — split a track into active segments over silent gaps before
# transcription/feature windows.  Frame k of seed s is SILENT iff
# (s % AF_MIX_MOD + k) % 4 == 0 (closed-form, so the whole chain —
# encode → PCM16 decode → integer energy → threshold → islands — is
# driver-hashable); active frames carry the fingerprint family's sine.
# ---------------------------------------------------------------------------

_SEG_SILENT_SQL = f"((CAST(s AS BIGINT) % {AF_MIX_MOD} + k) % 4 = 0)"

_AUDIO_SEG_ORACLE = f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id AS s FROM documents
  WHERE doc_id % 2 = 1
), frames AS (
  SELECT media_id, k.k,
         CASE WHEN {_SEG_SILENT_SQL} THEN 1 ELSE 0 END AS silent
  FROM ids, LATERAL (SELECT UNNEST(range(0, {AF_FRAMES})) AS k) k
), starts AS (
  SELECT media_id, k, silent,
         CASE WHEN silent = 0 AND COALESCE(LAG(silent) OVER (
              PARTITION BY media_id ORDER BY k), 1) = 1
              THEN 1 ELSE 0 END AS seg_start
  FROM frames
), segs AS (
  SELECT media_id, k,
         SUM(seg_start) OVER (
             PARTITION BY media_id ORDER BY k) AS seg_no
  FROM starts WHERE silent = 0
), spans AS (
  SELECT media_id, seg_no, MIN(k) AS lo, MAX(k) AS hi
  FROM segs GROUP BY 1, 2
)
SELECT f.media_id,
       CAST({AF_FRAMES} AS INT) AS n_frames,
       CAST(f.silent AS INT) AS n_silent,
       CAST(COALESCE(sp.n_segments, 0) AS INT) AS n_segments,
       COALESCE(sp.segments_csv, '') AS segments_csv
FROM (SELECT media_id, SUM(silent) AS silent FROM frames GROUP BY 1) f(media_id, silent)
LEFT JOIN (
  SELECT media_id, CAST(COUNT(*) AS INT) AS n_segments,
         array_to_string(list_sort(list(
             CAST(lo AS VARCHAR) || '-' || CAST(hi AS VARCHAR))), ',')
           AS segments_csv
  FROM spans GROUP BY 1
) sp USING (media_id)
"""


def audio_segmented_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIFF/WAVE tracks with silence structure: frame k of seed s is
    all-zero samples iff (s % AF_MIX_MOD + k) % 4 == 0, else the
    fingerprint family's bin-exact sine."""
    from taipei_bi_etl_spark.io import read_table

    ids = read_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 2 == 1
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    nf, fl, sr, amp, mixmod = AF_FRAMES, AF_FRAME_LEN, AF_SR, AF_AMP, AF_MIX_MOD

    # SELF-CONTAINED closure (foreign-cwd driver discipline)
    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def wav_for(s: int) -> bytes:
            srd = s % mixmod
            frames = []
            for k in range(nf):
                if (srd + k) % 4 == 0:
                    frames.append(np.zeros(fl, dtype="<i2"))
                    continue
                b = 5 + ((37 * srd * srd + 13 * k * k + 31 * k * srd + k**3) % mixmod) % 100
                t = np.arange(fl)
                frames.append(
                    np.round(amp * np.sin(2 * np.pi * b * t / fl)).astype("<i2")
                )
            data = np.concatenate(frames).tobytes()
            hdr = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
                1, 1, sr, sr * 2, 2, 16, b"data", len(data),
            )
            return hdr + data

        for pdf in batches:
            mids, payloads = [], []
            for i in pdf["doc_id"]:
                s = int(i)
                mids.append(s)
                payloads.append(wav_for(s))
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    return ids.mapInPandas(gen, schema=out_schema)


def audio_frame_energy(media: DataFrame) -> DataFrame:
    """Decode WAV bytes → per-frame INTEGER energy (sum of squared
    int16 samples — max {AF_FRAME_LEN}·{AF_AMP}² ≈ 2×10¹⁰ ≪ int64),
    one Arrow pass."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("k", T.IntegerType(), False),
            T.StructField("energy", T.LongType(), False),
        ]
    )
    nf, fl = AF_FRAMES, AF_FRAME_LEN

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def energies(payload: bytes):
            payload = bytes(payload)
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            data = payload[44 : 44 + nf * fl * 2]
            x = np.frombuffer(data, dtype="<i2").astype(np.int64)
            return (x.reshape(nf, fl) ** 2).sum(axis=1)

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for k, e in enumerate(energies(payload)):
                    rows.append((int(mid), k, int(e)))
            yield pd.DataFrame(rows, columns=["media_id", "k", "energy"])

    return media.mapInPandas(run, schema=schema)


@query(
    "multimodal_audio_segments",
    oracle=_AUDIO_SEG_ORACLE,
    tags=("multimodal", "extension"),
)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-shaped segmentation over REAL decoded PCM16:
    per-frame integer energy, silence = energy 0, active segments =
    gaps-and-islands over the frame sequence.  Per track: frame count,
    silent count, segment count, and the segment span list — all
    derivable closed-form by the oracle, so the driver hash certifies
    encode → decode → energy → threshold → islands end to end.

    100 TB: decode+energy is map-side (one narrow row per frame); the
    islands pass is one per-track window (media_id-keyed, {AF_FRAMES}
    rows per key) and one rollup — no cross-track work."""
    en = audio_frame_energy(audio_segmented_media(spark, sf_dir))
    from pyspark.sql import Window as W

    w = W.partitionBy("media_id").orderBy("k")
    flagged = en.select(
        "media_id",
        "k",
        F.when(F.col("energy") == 0, 1).otherwise(0).alias("silent"),
    )
    starts = flagged.withColumn(
        "seg_start",
        F.when(
            (F.col("silent") == 0)
            & (F.coalesce(F.lag("silent").over(w), F.lit(1)) == 1),
            1,
        ).otherwise(0),
    )
    segs = starts.filter(F.col("silent") == 0).withColumn(
        "seg_no", F.sum("seg_start").over(w)
    )
    spans = segs.groupBy("media_id", "seg_no").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    )
    span_agg = spans.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.concat_ws(
                        "-",
                        F.col("lo").cast("string"),
                        F.col("hi").cast("string"),
                    )
                )
            ),
            ",",
        ).alias("segments_csv"),
    )
    totals = flagged.groupBy("media_id").agg(
        F.lit(AF_FRAMES).cast("int").alias("n_frames"),
        F.sum("silent").cast("int").alias("n_silent"),
    )
    return totals.join(span_agg, "media_id", "left").select(
        "media_id",
        "n_frames",
        "n_silent",
        F.coalesce("n_segments", F.lit(0)).cast("int").alias("n_segments"),
        F.coalesce("segments_csv", F.lit("")).alias("segments_csv"),
    )
