"""Multimodal columns — opaque binary media with typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns plus a
typed metadata map; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` kernels so raw bytes never round-trip through Python row by
row and batches stay columnar end to end.

``decode_image`` is a REAL codec path for the formats a pure numpy/stdlib
kernel can parse — binary PPM (P6) and uncompressed 24-bit BMP (bottom-up
rows, 4-byte padding, BGR order all undone) — with nearest-neighbor resize;
``generate_images`` mints valid files of both formats deterministically, so
the decode is driver-oracled against an independent derivation of the
pixels. Compressed formats (PNG/JPEG) and video still need codec libraries
absent from this container: ``decode_features`` is the documented
deterministic byte-level stand-in for those, and ``sample_video_frames``
raises with its intended signature documented. Swapping in PIL/pyav changes
one kernel body, nothing structural.
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
    IntegerType,
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


def _image_pixel_stream(seed: int, mid: int, n_bytes: int) -> bytes:
    """Deterministic RGB byte stream: the concatenation of
    ``md5(f"{seed}|{mid}|{k}")`` digests for k = 0, 1, ... — reproducible by
    any engine with an md5 (the DuckDB driver oracle recomputes the same
    stream arithmetically, so the decode path is checked against an
    INDEPENDENT derivation of the pixels, not a copy of the decoder)."""
    out = b""
    k = 0
    while len(out) < n_bytes:
        out += hashlib.md5(f"{seed}|{mid}|{k}".encode()).digest()
        k += 1
    return out[:n_bytes]


def _encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + rgb


def _encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """Minimal 24-bit uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER,
    rows bottom-up, BGR, padded to 4 bytes — the layout quirks a decoder
    must actually undo."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = b""
    for r in range(h - 1, -1, -1):  # bottom-up
        row = rgb[r * w * 3 : (r + 1) * w * 3]
        bgr = b"".join(row[i * 3 : i * 3 + 3][::-1] for i in range(w))  # RGB→BGR
        body += bgr + b"\x00" * (stride - w * 3)
    data_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def image_dims(mid: int) -> tuple[int, int]:
    """Deterministic small test dimensions per media id (2-4 px per side)."""
    return 2 + (mid % 3), 2 + ((mid * 7) % 3)


def images_from_ids(ids: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic REAL image table keyed by an ``id`` column: even ids
    are binary PPM (P6), odd ids are 24-bit bottom-up BMP, pixels a pure
    md5 function of (seed, id) — valid files any external viewer/decoder
    would accept, generated without codec libraries."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = image_dims(mid)
                rgb = _image_pixel_stream(seed, mid, w * h * 3)
                if mid % 2 == 0:
                    payload, mime = _encode_ppm(w, h, rgb), "image/x-portable-pixmap"
                else:
                    payload, mime = _encode_bmp(w, h, rgb), "image/bmp"
                rows.append(
                    {
                        "media_id": mid,
                        "media": payload,
                        "mime": mime,
                        "meta": {"w": str(w), "h": str(h), "seed": str(seed)},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "mime", "meta"])

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def generate_images(spark: SparkSession, n: int, seed: int = 42, partitions: int = 4) -> DataFrame:
    """``images_from_ids`` over ``spark.range(n)`` (same distributed shape
    as ``generate_media`` — stands in for an object-store scan)."""
    return images_from_ids(spark.range(0, n, numPartitions=partitions), seed)


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


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fmt", StringType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ]
)


def _decode_ppm(payload: bytes):
    """P6 (binary PPM): 'P6' <ws> width <ws> height <ws> maxval <single ws>
    pixel bytes, RGB row-major top-down. Handles '#' comments and arbitrary
    whitespace in the header per the netpbm spec."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header tokenizer: skip whitespace + comments, collect 3 ints
    vals, i, n = [], 2, len(payload)
    while len(vals) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, pix.reshape(h, w, 3)


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): little-endian header,
    rows stored BOTTOM-UP (positive height) and padded to 4 bytes, channels
    in BGR order — the decoder flips rows, strips padding and swaps to RGB."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1]  # BGR → RGB


def decode_image(
    media: DataFrame,
    width: int | None = None,
    height: int | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """REAL image decode for the uncompressed formats a pure-numpy/stdlib
    kernel can handle — binary PPM (P6) and 24-bit BMP — with optional
    nearest-neighbor resize to (width, height). Compressed formats
    (PNG/JPEG) still require a codec library not present in this container;
    they raise (or are skipped with ``on_error="skip"``).

    Output: (media_id, fmt, src_w, src_h, w, h, pixels ARRAY<FLOAT>) with
    pixels the RGB row-major values (0-255) AFTER resize. Arrow-batched
    ``mapInPandas``: payload bytes stay columnar; per-image numpy slicing
    does the header parse, BMP row-flip/pad-strip/BGR-swap, and the resize
    index-gather — no per-pixel Python.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    if payload[:2] == b"P6":
                        fmt = "ppm"
                        sw, sh, arr = _decode_ppm(payload)
                    elif payload[:2] == b"BM":
                        fmt = "bmp"
                        sw, sh, arr = _decode_bmp(payload)
                    else:
                        raise ValueError(f"unrecognized image magic {payload[:2]!r}")
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                ow, oh = width or sw, height or sh
                if (ow, oh) != (sw, sh):  # nearest neighbor: index gather
                    ri = (np.arange(oh) * sh) // oh
                    ci = (np.arange(ow) * sw) // ow
                    arr = arr[ri][:, ci]
                out.append(
                    (int(mid), fmt, sw, sh, ow, oh,
                     arr.astype(np.float32).ravel().tolist())
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.select("media_id", "media").mapInPandas(kernel, schema=DECODED_SCHEMA)


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
