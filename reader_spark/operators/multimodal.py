"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

The Spark-side plumbing is real and tested — schema, Arrow batch
shape, mapInPandas partitioning; the codec layer (PIL/librosa/ffmpeg
are not in this container) is stubbed behind DECODERS with a
deterministic fake, each stub raising/faking in one obvious place.

Scale design: media bytes NEVER pass through a shuffle — decode /
feature-extract runs mapInPandas on the scan partitioning, emitting
small feature rows; only features shuffle. Batch size is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` (set it so
rows_per_batch x avg_blob_size fits executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical media-row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
            True,
        ),
    ]
)

# feat is array<double>, not float: each component is a 32-bit int
# over 2^32 — a dyadic rational, exact in IEEE double on every
# engine, so the DuckDB oracle can reproduce features bit-for-bit
# (float32 would round and break cross-engine equality).
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feat array<double>"
)


def _fake_image_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes -> unit-range
    floats seeded by content hash. Replace with PIL/torchvision when
    the libs exist."""
    h = hashlib.sha256(payload).digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    return [
        int.from_bytes(raw[4 * i: 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def _decode_image(payload: bytes) -> object:
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover - lib not in container
        raise NotImplementedError(
            "image decode requires PIL; container ships without it — "
            "feature extraction uses the deterministic fake instead"
        ) from e


def _decode_audio(payload: bytes) -> object:
    try:
        import librosa  # type: ignore
        import io

        return librosa.load(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover - lib not in container
        raise NotImplementedError(
            "audio decode requires librosa/soundfile; container ships "
            "without them — feature extraction uses the deterministic fake"
        ) from e


def _decode_video(payload: bytes) -> object:
    try:
        import av  # type: ignore
        import io

        return av.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover - lib not in container
        raise NotImplementedError(
            "video decode requires PyAV/ffmpeg; container ships without "
            "them — frame sampling plans stay real, the codec is stubbed"
        ) from e


DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_video}


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: per-partition Arrow batches of
    (id, payload) -> small feature rows. This is the pattern for ANY
    expensive per-blob op (resize, frame-sample, transcode)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "sha256": payloads.map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                    ),
                    "feat": payloads.map(
                        lambda b: None if b is None else _fake_image_features(b, dim)
                    ),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1_000) -> DataFrame:
    """Video frame-sampling PLAN: explode sample timestamps from
    metadata (pure expressions); the per-timestamp frame decode is the
    stubbed codec step. Demonstrates how the row explosion stays
    JVM-side while only the codec is Python."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("sample_ms"),
        )
    )
