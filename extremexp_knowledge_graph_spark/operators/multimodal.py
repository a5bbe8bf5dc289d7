"""Multimodal columns — opaque binary media with typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns plus a
typed metadata map; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` kernels so raw bytes never round-trip through Python row by
row and batches stay columnar end to end.

The decode step itself is STUBBED in this container (no PIL/ffmpeg/torchaudio
available): ``decode_features`` computes deterministic byte-level features —
real plumbing (schema, batching, partition flow) with a fake kernel — and the
library-backed entry points below raise ``NotImplementedError`` with the
intended signature documented. Swapping the stub for a real decoder changes
one function body, nothing structural.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

_MIMES = ["image/png", "audio/wav", "video/mp4"]


def generate_media(spark: SparkSession, n: int, seed: int = 42, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    (seed, id) — stands in for a real object-store scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                h = hashlib.sha256(f"{seed}:{mid}".encode()).digest()
                payload = (h * ((mid % 7) + 2))[: 64 + (mid % 512)]
                rows.append(
                    {
                        "media_id": mid,
                        "media": payload,
                        "mime": _MIMES[mid % len(_MIMES)],
                        "meta": {"source": f"synthetic/{mid}", "seed": str(seed)},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "mime", "meta"])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """STUB decode/feature-extract kernel (deterministic fake).

    Real implementation would decode the payload (PIL/librosa/pyav) and run
    a feature extractor; this computes byte-level statistics + a digest-
    derived pseudo-embedding so downstream operators (ANN, dedup) are
    exercised with honest schemas and batch shapes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # columnar zip, not iterrows — per-item hashing is inherent but
            # batch traversal stays O(n) without pandas row-boxing overhead
            for mid, payload, mime in zip(pdf["media_id"], pdf["media"], pdf["mime"]):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(payload).hexdigest()
                feat = [
                    float(int(digest[i * 4 : i * 4 + 4], 16)) / 65535.0 for i in range(dim)
                ]
                out.append((int(mid), mime, len(payload), digest, feat))
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize-decode images to (width, height) RGB arrays.

    NOT IMPLEMENTED in this container: requires an image codec (PIL/cv2).
    Intended: mapInPandas kernel, output schema
    (media_id LONG, pixels ARRAY<FLOAT>, w INT, h INT).
    """
    raise NotImplementedError("image decode requires PIL/cv2 — not available in this environment")


def sample_video_frames(media: DataFrame, every_n_seconds: float) -> DataFrame:
    """Sample frames from video payloads.

    NOT IMPLEMENTED in this container: requires ffmpeg/pyav. Intended:
    mapInPandas kernel, output (media_id LONG, frame_ts DOUBLE, frame BINARY).
    """
    raise NotImplementedError("video frame sampling requires pyav/ffmpeg — not available")


def media_stats(media: DataFrame) -> DataFrame:
    """Native byte-level stats — no Python: length + mime grouping."""
    return (
        media.groupBy("mime")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.length("media")).cast("long").alias("total_bytes"),
        )
    )
