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

    d = read_table(spark, sf_dir, "documents")
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
            F.length("text").cast("long").alias("n_bytes"),
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
