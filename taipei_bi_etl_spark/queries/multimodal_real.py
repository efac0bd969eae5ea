"""REAL-codec multimodal queries (r02): the decode path executes
actual byte-level codecs (P6 PPM images, RIFF/WAVE PCM16 audio —
multimodal.py's numpy-only codecs), and the ORACLE recomputes the same
statistics from first principles in SQL — no decoding on the oracle
side, just the closed forms the synthesized media obeys:

* image pixels are ``(3x + 5y + 7c + id) % 256``, so every channel sum
  is a double ``generate_series`` sum DuckDB evaluates exactly;
* audio samples are ``round(A · sin(2π f k / sr))`` with f odd and
  coprime to 5, so the sign of sample k is the parity of
  ``floor(f·k / (sr/2))`` — zero crossings are EXACT integer
  arithmetic (int16 rounding cannot flip a sign: the smallest nonzero
  |sin| on the lattice is sin(π/4000) ≈ 7.9e-4 → |sample| ≥ 9).

A hash match therefore certifies the whole encode → bytes → decode →
feature pipeline against an independent derivation that never touches
the bytes — a stronger check than a decode-vs-decode comparison.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taipei_bi_etl_spark.multimodal import WAV_AMP, WAV_N, WAV_SR
from taipei_bi_etl_spark.queries import query

if TYPE_CHECKING:
    import pandas as pd

_IMG_ORACLE = """
WITH ids AS (
  SELECT doc_id AS media_id,
         16 + doc_id % 17 AS w,
         12 + doc_id % 13 AS h
  FROM documents WHERE doc_id % 2 = 0
), px AS (
  SELECT media_id, w, h, x.x, y.y
  FROM ids,
       LATERAL (SELECT UNNEST(range(0, w)) AS x) x,
       LATERAL (SELECT UNNEST(range(0, h)) AS y) y
)
SELECT media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM((3 * x + 5 * y + 0 + media_id) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((3 * x + 5 * y + 7 + media_id) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((3 * x + 5 * y + 14 + media_id) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY media_id
"""


@query(
    "multimodal_image_decode_roundtrip",
    oracle=_IMG_ORACLE,
    tags=("multimodal", "extension"),
)
def multimodal_image_decode_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL image decode: P6 PPM payloads are parsed byte-for-byte
    (header fields, raw RGB buffer) and per-channel pixel sums are
    computed from the DECODED array; the oracle re-derives the sums
    from the generating formula without ever seeing the bytes.

    Scale: payload generation and decode both run in Arrow batches
    (mapInPandas) — bytes never cross a Python row boundary; the
    output is one narrow row per image."""
    from taipei_bi_etl_spark.multimodal import (
        decode_ppm,
        synthesize_real_media,
    )

    media = synthesize_real_media(spark, sf_dir).filter(
        F.col("kind") == "image"
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def parse(payload: bytes):
            if not payload.startswith(b"P6"):
                raise ValueError("not a P6 PPM")
            parts = bytes(payload).split(b"\n", 3)
            w, h = (int(v) for v in parts[1].split())
            raw = parts[3][: w * h * 3]
            return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, pix = parse(payload)
                s = pix.astype(np.int64).sum(axis=(0, 1))
                rows.append((int(mid), w, h, int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return media.mapInPandas(run, schema=schema)


def _audio_oracle() -> str:
    half = WAV_SR // 2
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id,
         101 + 2 * (doc_id % 97) AS f0
  FROM documents WHERE doc_id % 2 = 1
), freq AS (
  SELECT media_id,
         CASE WHEN f0 % 5 = 0 THEN f0 + 2 ELSE f0 END AS f
  FROM ids
), signs AS (
  SELECT media_id, k.k,
         (f * k.k // {half}) % 2 AS par
  FROM freq, LATERAL (SELECT UNNEST(range(1, {WAV_N})) AS k) k
), flips AS (
  SELECT media_id, k,
         CASE WHEN par <> LAG(par) OVER (PARTITION BY media_id ORDER BY k)
              THEN 1 ELSE 0 END AS flip
  FROM signs
)
SELECT media_id,
       {WAV_SR} AS sample_rate,
       CAST({WAV_N} AS BIGINT) AS n_samples,
       CAST(SUM(flip) AS BIGINT) AS zero_crossings,
       TRUE AS rms_ok
FROM flips
GROUP BY media_id
"""


@query(
    "multimodal_audio_decode_features",
    oracle=_audio_oracle(),
    tags=("multimodal", "extension"),
)
def multimodal_audio_decode_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL audio decode: RIFF/WAVE chunks are walked, PCM16 samples
    extracted, and signal features computed from the DECODED waveform —
    sample rate and count from the header, zero crossings from actual
    sign changes, and an RMS gate (a pure sine's RMS is A/√2; assert
    within 1%).  The oracle computes sample_rate/n_samples as literals
    and the zero-crossing count from the floor-parity closed form —
    integer arithmetic only, no trig on the SQL side."""
    from taipei_bi_etl_spark.multimodal import (
        decode_wav_pcm16,
        synthesize_real_media,
    )

    media = synthesize_real_media(spark, sf_dir).filter(
        F.col("kind") == "audio"
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("zero_crossings", T.LongType()),
            T.StructField("rms_ok", T.BooleanType()),
        ]
    )
    amp = WAV_AMP

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def parse(payload: bytes):
            payload = bytes(payload)
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not RIFF/WAVE")
            pos, sr, data = 12, None, None
            while pos + 8 <= len(payload):
                cid, size = struct.unpack_from("<4sI", payload, pos)
                body = payload[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    _f, _c, sr, _br, _ba, _b = struct.unpack_from(
                        "<HHIIHH", body
                    )
                elif cid == b"data":
                    data = np.frombuffer(body, dtype="<i2")
                pos += 8 + size + (size & 1)
            return sr, data

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, data = parse(payload)
                # sign changes over k>=1 (sample 0 is exactly zero)
                signs = data[1:] > 0
                zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
                rms = float(np.sqrt(np.mean(data.astype(np.float64) ** 2)))
                rms_ok = abs(rms - amp / np.sqrt(2)) < 0.01 * amp
                rows.append((int(mid), int(sr), len(data), zc, bool(rms_ok)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "zero_crossings", "rms_ok",
                ],
            )

    return media.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Video — a real frame container (length-prefixed PPM frames), real
# frame extraction, closed-form oracle.
# ---------------------------------------------------------------------------


_VIDEO_ORACLE = """
WITH vids AS (
  SELECT doc_id AS media_id,
         16 + doc_id % 9 AS w,
         8 + doc_id % 7 AS h,
         3 + doc_id % 4 AS nf
  FROM documents
), frames AS (
  SELECT media_id, w, h, f.f
  FROM vids, LATERAL (SELECT UNNEST(range(0, nf)) AS f) f
), px AS (
  SELECT media_id, w, h, f, x.x, y.y
  FROM frames,
       LATERAL (SELECT UNNEST(range(0, w)) AS x) x,
       LATERAL (SELECT UNNEST(range(0, h)) AS y) y
)
SELECT media_id,
       CAST(f AS INT) AS frame_idx,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM((3 * x + 5 * y + media_id + 11 * f) % 256)
            + SUM((3 * x + 5 * y + 7 + media_id + 11 * f) % 256)
            + SUM((3 * x + 5 * y + 14 + media_id + 11 * f) % 256)
            AS BIGINT) AS pixel_sum
FROM px
GROUP BY media_id, f
"""


@query(
    "multimodal_video_frame_stats",
    oracle=_VIDEO_ORACLE,
    tags=("multimodal", "extension"),
)
def multimodal_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame extraction: each payload is a length-prefixed
    container of P6 PPM frames ('VID1' magic + u32 frame count + per
    frame u32 length + PPM bytes); the decoder walks the index, parses
    every frame image, and emits per-frame pixel statistics.  The
    oracle recomputes them from the generating formula — the container
    walk, the per-frame PPM parse, and the byte layout are all under
    the hash.

    This replaces the stand-in byte-slice frame sampler as the video
    path: frame extraction is now an actual demux, as it would be with
    a codec library, while staying numpy-only.  One container per Arrow
    batch row; frames fan out ~4× inside the batch."""
    from taipei_bi_etl_spark.io import read_table

    ids = read_table(spark, sf_dir, "documents").select("doc_id")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def encode_video(i: int) -> bytes:
            w, h, nf = 16 + i % 9, 8 + i % 7, 3 + i % 4
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            frames = []
            for f in range(nf):
                pix = (3 * x + 5 * y + 7 * c + i + 11 * f) % 256
                ppm = (
                    f"P6\n{w} {h}\n255\n".encode()
                    + pix.astype(np.uint8).tobytes()
                )
                frames.append(struct.pack("<I", len(ppm)) + ppm)
            return b"VID1" + struct.pack("<I", nf) + b"".join(frames)

        def demux(payload: bytes):
            payload = bytes(payload)
            if payload[:4] != b"VID1":
                raise ValueError("not a VID1 container")
            (nf,) = struct.unpack_from("<I", payload, 4)
            pos = 8
            for _ in range(nf):
                (ln,) = struct.unpack_from("<I", payload, pos)
                yield payload[pos + 4 : pos + 4 + ln]
                pos += 4 + ln

        def parse_ppm(ppm: bytes):
            parts = ppm.split(b"\n", 3)
            w, h = (int(v) for v in parts[1].split())
            raw = parts[3][: w * h * 3]
            return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                for fidx, ppm in enumerate(demux(encode_video(i))):
                    w, h, pix = parse_ppm(ppm)
                    rows.append(
                        (i, fidx, w, h, int(pix.astype(np.int64).sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height", "pixel_sum",
                ],
            )

    return ids.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# Spectral analysis — a REAL FFT over decoded samples, exact oracle.
# ---------------------------------------------------------------------------


def _dominant_freq_oracle() -> str:
    # The synthesized clip is a pure sine at integer frequency
    # f = 101 + 2·(id % 97), bumped +2 once if divisible by 5 (the two
    # candidates differ by 2 so at most one bump).  A rectangular-
    # windowed pure sine's |rfft| peaks at the bin NEAREST the true
    # frequency f·N/sr = f·32/125 bins; rounding is never half-exact
    # (64f + 125 ≡ 0 mod 250 requires 64f odd — impossible), and the
    # worst-case tie margin is ≥1.6% in magnitude, far above FFT
    # numerical noise, so the argmax is closed-form integer math.
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id,
         101 + 2 * (doc_id % 97) AS f0
  FROM documents WHERE doc_id % 2 = 1
), freq AS (
  SELECT media_id,
         CASE WHEN f0 % 5 = 0 THEN f0 + 2 ELSE f0 END AS f
  FROM ids
)
SELECT media_id,
       CAST((64 * f + 125) // 250 AS INT) AS peak_bin,
       CAST(((64 * f + 125) // 250) * {WAV_SR} AS BIGINT) * 1000
         // {WAV_N} AS est_freq_millihz
FROM freq
"""


@query(
    "multimodal_audio_dominant_freq",
    oracle=_dominant_freq_oracle(),
    tags=("multimodal", "extension"),
)
def multimodal_audio_dominant_freq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL spectral feature extraction: decode the WAV, run an actual
    numpy rfft over the samples, and report the dominant frequency bin
    — the first step of any audio fingerprint / VAD / language-ID
    pipeline.  The oracle never touches bytes or transcendentals: the
    synthesized sine's peak bin has a closed integer form (see
    `_dominant_freq_oracle`), so a hash match certifies encode →
    decode → FFT → argmax end to end.  (The exact generator frequency
    is NOT recoverable from the bin — bin width sr/N ≈ 3.9 Hz exceeds
    the 2 Hz candidate spacing — so the feature is the bin and its
    frequency estimate, as in any real spectral pipeline.)

    Scale: Arrow-batched mapInPandas; each clip's FFT is O(N log N) on
    a worker, no shuffle at all — the aggregate-free map shape every
    per-asset feature extractor has.
    """
    from taipei_bi_etl_spark.multimodal import synthesize_real_media

    media = synthesize_real_media(spark, sf_dir).filter(
        F.col("kind") == "audio"
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("peak_bin", T.IntegerType()),
            T.StructField("est_freq_millihz", T.LongType()),
        ]
    )
    sr, n = WAV_SR, WAV_N

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def parse(payload: bytes):
            payload = bytes(payload)
            pos, data = 12, None
            while pos + 8 <= len(payload):
                cid, size = struct.unpack_from("<4sI", payload, pos)
                if cid == b"data":
                    data = np.frombuffer(
                        payload[pos + 8 : pos + 8 + size], dtype="<i2"
                    )
                pos += 8 + size + (size & 1)
            return data

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = parse(payload).astype(np.float64)
                mag = np.abs(np.fft.rfft(data))
                peak = int(np.argmax(mag))
                est_millihz = peak * sr * 1000 // n
                rows.append((int(mid), peak, est_millihz))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "peak_bin", "est_freq_millihz"],
            )

    return media.mapInPandas(run, schema=schema)
