"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages
(SURVEY §7.1 step 8 extension; the reference is text/telemetry-only).

The Spark-side plumbing here is REAL and tested — schema, partitioning,
UDF signatures, batch iteration.  The codec step is a deliberate STUB:
this container has no image/audio libraries, so ``decode_image`` tries
Pillow and otherwise raises ``NotImplementedError``; the pipeline's
default path uses :func:`fake_decode` — a deterministic byte-statistics
"decoder" — so every downstream stage (feature extraction, resizing,
frame sampling) is executable and verifiable today and swaps to a real
codec by changing one function.

Scale notes:

* Payloads never pass through Python row-at-a-time — only Arrow record
  batches (``mapInPandas``), with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounding batch
  memory (payloads are big; keep batches small).
* Each batch yields its output immediately (generator) — no
  per-partition materialization.
* Binary columns are incompressible; partition sizing should target
  ``maxPartitionBytes`` on payload bytes, not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

N_FEATURES = 16
N_FRAMES = 4

#: media_id + opaque payload + typed metadata (the multimodal table shape).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents``: payload =
    UTF-8 bytes of the text (an opaque stand-in), metadata from doc
    stats.  Real deployments read payloads via ``spark.read.format
    ('binaryFile')`` — same downstream schema."""
    from taipei_bi_etl_spark.io import read_table

    # NULL text encodes to a NULL payload — not a media row.
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.lit("fake/v1").alias("format"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            # octet_length of the PAYLOAD — length(text) is the CHAR
            # count, which silently diverges on multi-byte text
            F.octet_length(F.encode("text", "utf-8"))
            .cast("long")
            .alias("n_bytes"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Codec boundary — the stub.
# ---------------------------------------------------------------------------


def decode_image(payload: bytes):
    """Decode an image payload to a pixel array.  STUB: requires Pillow,
    which is not in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image decoding requires Pillow; use fake_decode for the "
            "deterministic test path"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def fake_decode(payload: bytes, n_features: int = N_FEATURES) -> list[float]:
    """Deterministic stand-in decoder: bucketed byte histogram, L1
    normalized — stable across runs/partitions, so downstream stages are
    testable without codecs."""
    if not payload:
        return [0.0] * n_features
    counts = [0] * n_features
    for b in payload:
        counts[b % n_features] += 1
    total = float(len(payload))
    return [c / total for c in counts]


# ---------------------------------------------------------------------------
# Arrow-batched stages.
# ---------------------------------------------------------------------------


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over Arrow batches (mapInPandas).  One output
    row per media row; payload bytes stay inside the Arrow pipe.

    The worker fn is built as a runtime closure so cloudpickle ships it
    BY VALUE — executors never need this package importable (the driver
    may run us from a foreign cwd with only sys.path patched)."""
    n_features = N_FEATURES

    def decode(payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * n_features
        counts = [0] * n_features
        for b in payload:
            counts[b % n_features] += 1
        total = float(len(payload))
        return [c / total for c in counts]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "features": [decode(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling for video payloads: N evenly-spaced byte slices
    per payload (stand-in for codec frame extraction).  Fan-out stage:
    one input row → n_frames output rows, still batch-wise."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["kind"] != "video" or not payload:
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    lo = i * step
                    if lo >= len(payload):
                        break
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[lo : lo + step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """'Resize' planning pass — pure Column math (no Python): new dims
    preserving aspect ratio, clamped to ``max_side``.  The actual pixel
    resample belongs in the codec stub; the plan-side arithmetic and
    schema evolution are the Spark-relevant part."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    return media.withColumn(
        "resized",
        F.struct(
            F.ceil(w * scale).cast("int").alias("width"),
            F.ceil(h * scale).cast("int").alias("height"),
        ),
    )


# ---------------------------------------------------------------------------
# REAL codecs (r02) — formats decodable with stdlib + numpy alone.
#
# The stub above remains the gate for COMPRESSED formats (JPEG/PNG/mp3
# need Pillow/audio libs this container lacks).  But raw formats need
# no library: PPM P6 is a header + raw RGB bytes, and RIFF/WAVE PCM16
# is a header + raw little-endian samples.  These codecs are REAL —
# actual byte-level encode/decode — which upgrades the multimodal
# family from "plumbing real, codec stubbed" to "decode path real for
# numpy-decodable formats, compressed formats env-gated".
# ---------------------------------------------------------------------------

WAV_SR = 8000
WAV_N = 2048
WAV_AMP = 12000


def encode_ppm(width: int, height: int, pix) -> bytes:
    """P6 PPM bytes from an (h, w, 3) uint8 array."""
    import numpy as np

    header = f"P6\n{width} {height}\n255\n".encode()
    return header + np.ascontiguousarray(pix, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes):
    """P6 PPM → (h, w, 3) uint8 array.  Real parse: header fields,
    maxval check, raw buffer reshape."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = payload.split(b"\n", 3)
    width, height = (int(x) for x in parts[1].split())
    if int(parts[2]) != 255:
        raise ValueError("only maxval 255 supported")
    raw = parts[3][: width * height * 3]
    return np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)


def encode_wav_pcm16(samples, sr: int = WAV_SR) -> bytes:
    """Minimal RIFF/WAVE PCM16 mono encoder (stdlib struct + numpy)."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sr, sr * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes):
    """RIFF/WAVE PCM16 mono → (sample_rate, int16 array).  Real parse:
    chunk walk to fmt/data, format assertions."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sr, data


def resize_nearest(pix, max_side: int):
    """REAL nearest-neighbor resize via numpy index selection —
    replaces the plan-only resize for numpy-decodable images."""
    import numpy as np

    h, w = pix.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    ys = (np.arange(nh) * (h / nh)).astype(int)
    xs = (np.arange(nw) * (w / nw)).astype(int)
    return pix[ys][:, xs]


def synthesize_real_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL media payloads, generated distributed (Arrow
    batches, numpy): even doc_ids get a P6 PPM whose pixel (x, y, c) is
    ``(3x + 5y + 7c + id) % 256``; odd doc_ids get a PCM16 WAV sine of
    integer frequency coprime to sr/2 (so no sample is exactly zero
    except k=0 — the property the zero-crossing oracle relies on)."""
    from taipei_bi_etl_spark.io import read_table

    ids = read_table(spark, sf_dir, "documents").select("doc_id")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    sr, n, amp = WAV_SR, WAV_N, WAV_AMP

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def ppm_for(i: int) -> bytes:
            w, h = 16 + i % 17, 12 + i % 13
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            pix = (3 * x + 5 * y + 7 * c + i) % 256
            header = f"P6\n{w} {h}\n255\n".encode()
            return header + pix.astype(np.uint8).tobytes()

        def wav_for(i: int) -> bytes:
            import struct

            f = 101 + 2 * (i % 97)
            while f % 5 == 0:
                f += 2
            k = np.arange(n)
            samples = np.round(
                amp * np.sin(2 * np.pi * f * k / sr)
            ).astype("<i2")
            data = samples.tobytes()
            hdr = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
                1, 1, sr, sr * 2, 2, 16, b"data", len(data),
            )
            return hdr + data

        for pdf in batches:
            ids_, kinds, payloads = [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                ids_.append(i)
                if i % 2 == 0:
                    kinds.append("image")
                    payloads.append(ppm_for(i))
                else:
                    kinds.append("audio")
                    payloads.append(wav_for(i))
            yield pd.DataFrame(
                {"media_id": ids_, "kind": kinds, "payload": payloads}
            )

    return ids.mapInPandas(gen, schema=out_schema)
