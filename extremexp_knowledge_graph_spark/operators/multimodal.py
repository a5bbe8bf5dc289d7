"""Multimodal columns — opaque binary media with typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns plus a
typed metadata map; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` kernels so raw bytes never round-trip through Python row by
row and batches stay columnar end to end.

``decode_image`` is a REAL codec path for the formats a pure numpy/stdlib
kernel can parse — binary PPM (P6), uncompressed 24-bit BMP (bottom-up
rows, 4-byte padding, BGR order all undone), and 8-bit RGB/RGBA **PNG**
(zlib IDAT inflate + all five scanline filters None/Sub/Up/Average/Paeth
reconstructed; stdlib ``zlib`` is the inflater, the unfilter loop is ours)
— with nearest-neighbor resize. ``decode_audio`` is the audio analogue:
RIFF/WAVE PCM-16 parsing via ``struct`` + ``np.frombuffer``.
``generate_images`` / ``audio_from_ids`` mint valid files of every format
deterministically, so both decoders are driver-oracled against an
INDEPENDENT arithmetic derivation of the payload stream. ``sample_video_frames`` walks real YUV4MPEG2 (.y4m) streams — the
uncompressed video interchange format — with frame-domain stride sampling.
**JPEG is real too**: a general baseline-sequential decoder (marker walk,
arbitrary DHT tables, full DC-diff + AC run/size entropy decode, dequant,
float IDCT, 4:2:0 replication upsample, JFIF color convert) plus an
encoder minting standard JFIF fixtures in coefficient space — see the
"JPEG" section below. What still needs codec libraries absent from this
container: progressive/arithmetic JPEG and compressed video (mp4/webm) —
``decode_features`` is the documented deterministic byte-level stand-in
for those. Swapping in PIL/pyav changes one kernel body, nothing
structural.
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
    DoubleType,
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


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _encode_png(w: int, h: int, rgb: bytes, filter_for_row=None) -> bytes:
    """Minimal spec-valid PNG: 8-bit color type 2 (RGB), non-interlaced,
    one IDAT. ``filter_for_row(r)`` picks the scanline filter (0-4) so the
    generator can exercise every predictor the decoder must undo; filters
    reference the RAW previous scanline per the PNG spec."""
    import struct
    import zlib

    bpp, stride = 3, w * 3
    raw = bytearray()
    prev = bytes(stride)
    for r in range(h):
        line = rgb[r * stride : (r + 1) * stride]
        f = filter_for_row(r) if filter_for_row else 0
        if f == 0:
            filt = line
        else:
            fb = bytearray(stride)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                fb[x] = (line[x] - pred) & 0xFF
            filt = bytes(fb)
        raw.append(f)
        raw += filt
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _lzw_encode_gif(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: CLEAR first, dict grows from EOI+1, code width
    grows at each power of two up to 12 bits, codes packed LSB-first."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(1 << min_code_size)}
    next_code, width = eoi + 1, min_code_size + 1
    out_bits, bitbuf, nbits = bytearray(), 0, 0

    def emit(code):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:  # table full: reset (tiny images never reach this)
            emit(clear)
            table = {bytes([i]): i for i in range(1 << min_code_size)}
            next_code, width = eoi + 1, min_code_size + 1
        seq = bytes([b])
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out_bits.append(bitbuf & 0xFF)
    return bytes(out_bits)


def _lzw_decode_gif(data: bytes, min_code_size: int = 8) -> bytes:
    """Inverse of ``_lzw_encode_gif`` including the KwKwK case (a code one
    past the table references the just-emitted sequence plus its own first
    byte)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
    width = min_code_size + 1
    out, prev = bytearray(), None
    bitbuf, nbits, pos = 0, 0, 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated (no EOI)")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = table[: eoi + 1]
            width, prev = min_code_size + 1, None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW bad code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # the decoder's table is one entry BEHIND the encoder's at the
            # moment it reads each code (it reconstructs entry i-1 from
            # code i), so it must widen one entry early
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry


def _encode_gif(w: int, h: int, indices: bytes) -> bytes:
    """Minimal spec-valid GIF87a: grayscale 256-entry global color table
    (palette[i] = (i,i,i)), one non-interlaced image, LZW-compressed pixel
    indices in 255-byte sub-blocks."""
    import struct

    gct = b"".join(bytes([i, i, i]) for i in range(256))
    out = b"GIF87a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0) + gct
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode_gif(indices)
    out += bytes([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    return out + b"\x00\x3b"


def _decode_gif(payload: bytes):
    """GIF87a/89a: logical screen descriptor + global color table, skips
    extension blocks, decodes the first non-interlaced image's LZW indices
    and maps them through the palette to RGB. Interlaced images and local
    color tables raise — honest scope."""
    import struct

    import numpy as np

    if payload[:4] != b"GIF8":
        raise ValueError("not a GIF")
    sw, sh, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if ipacked & 0x80:
                raise ValueError("local color table unsupported")
            if gct is None:
                raise ValueError("GIF missing global color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _lzw_decode_gif(bytes(lzw), min_code), np.uint8, w * h
            )
            return w, h, gct[idx].reshape(h, w, 3)
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image")


def gifs_from_ids(ids: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic REAL GIF table: grayscale GIF87a whose pixel INDICES
    are the md5 stream (w*h bytes) through the identity-gray palette —
    decoded RGB is each stream byte tripled, so the driver oracle derives
    pixel j as stream byte j // 3."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = image_dims(mid)
                idx = _image_pixel_stream(seed, mid, w * h)
                rows.append(
                    {
                        "media_id": mid,
                        "media": _encode_gif(w, h, idx),
                        "mime": "image/gif",
                        "meta": {"w": str(w), "h": str(h), "seed": str(seed)},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "mime", "meta"])

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def image_dims(mid: int) -> tuple[int, int]:
    """Deterministic small test dimensions per media id (2-4 px per side).
    The height multiplier must be != 1 (mod 3) or h would always equal w
    and a row/column transposition bug in any decoder could never show."""
    return 2 + (mid % 3), 2 + ((mid * 5) % 3)


def images_from_ids(ids: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic REAL image table keyed by an ``id`` column: ids cycle
    through binary PPM (P6), 24-bit bottom-up BMP, and zlib-compressed PNG
    (scanline filter ``(id + row) % 5`` so all five predictors occur);
    pixels a pure md5 function of (seed, id) — valid files any external
    viewer/decoder would accept, generated without codec libraries."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = image_dims(mid)
                rgb = _image_pixel_stream(seed, mid, w * h * 3)
                if mid % 3 == 0:
                    payload, mime = _encode_ppm(w, h, rgb), "image/x-portable-pixmap"
                elif mid % 3 == 1:
                    payload, mime = _encode_bmp(w, h, rgb), "image/bmp"
                else:
                    payload = _encode_png(w, h, rgb, lambda r, m=mid: (m + r) % 5)
                    mime = "image/png"
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


import struct as _struct
import zlib as _zlib

# every malformed-payload shape a hostile corpus can throw at the codec
# kernels: bad magic/params (ValueError), truncated headers (struct.error /
# IndexError), corrupt DEFLATE streams (zlib.error), missing markers
# (ValueError from bytes.index)
_DECODE_ERRORS = (ValueError, IndexError, _struct.error, _zlib.error)


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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _unfilter_scanlines(raw: bytes, w: int, h: int, bpp: int):
    """PNG filter reconstruction. None/Up are whole-row numpy ops (uint8
    wraparound IS the mod-256 the spec wants); Sub is a per-channel-lane
    cumulative sum; Average/Paeth are inherently sequential along the row
    (each byte's predictor reads the just-reconstructed left neighbor), so
    they run the per-byte loop the spec's data dependency forces."""
    import numpy as np

    stride = w * bpp
    if len(raw) < h * (1 + stride):
        raise ValueError("PNG IDAT truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos)
        pos += stride
        prev = out[r - 1] if r else np.zeros(stride, np.uint8)
        if f == 0:
            out[r] = line
        elif f == 2:  # Up
            out[r] = line + prev
        elif f == 1:  # Sub: cumsum down the pixels, per channel lane
            lanes = line.reshape(w, bpp).astype(np.uint32)
            out[r] = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 3:  # Average
            cur = out[r]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = out[r]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
    return out


def _decode_png(payload: bytes):
    """8-bit RGB (color type 2) / RGBA (6, alpha dropped) non-interlaced
    PNG: chunk walk with CRC check, concatenated-IDAT zlib inflate, then
    ``_unfilter_scanlines``. Palette/interlace/16-bit raise — honest scope,
    not silent garbage."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color_type={ctype} interlace={interlace}"
        )
    bpp = 3 if ctype == 2 else 4
    arr = _unfilter_scanlines(zlib.decompress(idat), w, h, bpp).reshape(h, w, bpp)
    return w, h, np.ascontiguousarray(arr[:, :, :3])  # RGBA → drop alpha


def decode_image(
    media: DataFrame,
    width: int | None = None,
    height: int | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """REAL image decode for the formats a pure-numpy/stdlib kernel can
    handle — binary PPM (P6), 24-bit BMP, 8-bit RGB/RGBA PNG (stdlib zlib
    inflate + full five-filter reconstruction), GIF87a/89a (our own LZW),
    and baseline-sequential JPEG (our own Huffman + IDCT) — with optional
    nearest-neighbor resize to (width, height). Progressive JPEG and
    formats needing external codec libraries raise; unrecognized payloads
    raise (or are skipped with ``on_error="skip"``).

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
                    elif payload[:8] == _PNG_MAGIC:
                        fmt = "png"
                        sw, sh, arr = _decode_png(payload)
                    elif payload[:4] == b"GIF8":
                        fmt = "gif"
                        sw, sh, arr = _decode_gif(payload)
                    elif payload[:2] == b"\xff\xd8":
                        fmt = "jpeg"
                        sw, sh, arr = _decode_jpeg(payload)
                    else:
                        raise ValueError(f"unrecognized image magic {payload[:2]!r}")
                except _DECODE_ERRORS:
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


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU T.81), pure numpy/stdlib
# ---------------------------------------------------------------------------
# The encoder mints fully-standard baseline JFIF files (any external decoder
# accepts them); the decoder is GENERAL for baseline sequential: marker walk,
# arbitrary DHT Huffman tables, full DC-diff + AC run/size entropy decoding,
# dequant, zigzag, float IDCT, 4:2:0/4:4:4 chroma replication upsample, JFIF
# YCbCr→RGB. Progressive (SOF2), 12-bit, arithmetic coding, and restart
# intervals raise — honest scope boundaries, not silent garbage.

#: zigzag position k → natural row-major index (T.81 Figure A.6 — a public
#: constant of the format, like the PNG filter ids)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: our own (NOT Annex K) valid Huffman specs — every code the same length,
#: trivially Kraft-satisfying, no all-ones code: DC = 12 category symbols at
#: 4 bits; AC = EOB + ZRL + all (run 0-15, size 1-10) at 8 bits (162 ≤ 255).
#: Compression is irrelevant for minted fixtures; validity is not.
_JPEG_DC_SPEC = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
_JPEG_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_AC_SPEC = ([0] * 7 + [len(_JPEG_AC_SYMS)] + [0] * 8, _JPEG_AC_SYMS)
_JPEG_QTABLE = [16] * 64  # flat ×16: DC-only blocks dequantize to exact ints


def _jpeg_huff_codes(bits, vals):
    """Canonical JPEG Huffman assignment (T.81 C.2): symbol → (code, len)."""
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit packer with 0xFF→0xFF00 byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


def _jpeg_mode_geometry(w: int, h: int, mode: str):
    """(components, (hmax, vmax), mcus_x, mcus_y, blocks_per_mcu_per_comp).

    components: list of (id, (h_samp, v_samp)). blocks per MCU per comp =
    h_samp * v_samp; scan interleave order is per-MCU, per-component,
    sub-blocks raster within the component's sampling grid (T.81 A.2.3)."""
    if mode == "gray":
        comps = [(1, (1, 1))]
    elif mode == "444":
        comps = [(1, (1, 1)), (2, (1, 1)), (3, (1, 1))]
    elif mode == "420":
        comps = [(1, (2, 2)), (2, (1, 1)), (3, (1, 1))]
    else:
        raise ValueError(f"unknown jpeg mode {mode!r}")
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    return comps, (hmax, vmax), mcus_x, mcus_y


def _encode_jpeg(w: int, h: int, mode: str, coeff_blocks) -> bytes:
    """Standard baseline JFIF from quantized coefficient blocks.

    ``coeff_blocks``: one 64-int list (ZIGZAG order) per block, in scan
    interleave order (per MCU, per component, per sub-block). Working in
    coefficient space means no forward DCT is needed and the decoder's
    output is an exact arithmetic function of these ints — the property the
    driver oracle replays."""
    import struct

    comps, _, mcus_x, mcus_y = _jpeg_mode_geometry(w, h, mode)
    dc_codes = _jpeg_huff_codes(*_JPEG_DC_SPEC)
    ac_codes = _jpeg_huff_codes(*_JPEG_AC_SPEC)

    out = bytearray(b"\xff\xd8")  # SOI
    qt = bytes([0x00] + _JPEG_QTABLE)  # precision 0, table id 0
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qt)) + qt
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, (hs, vs) in comps:
        sof += struct.pack(">BBB", cid, (hs << 4) | vs, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, (bits, vals) in ((0, _JPEG_DC_SPEC), (1, _JPEG_AC_SPEC)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([len(comps)])
    for cid, _ in comps:
        sos += bytes([cid, 0x00])  # DC table 0 / AC table 0
    sos += b"\x00\x3f\x00"  # spectral 0..63, Ah/Al 0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _JpegBitWriter()
    pred = {cid: 0 for cid, _ in comps}
    bi = 0
    for _ in range(mcus_x * mcus_y):
        for cid, (hs, vs) in comps:
            for _ in range(hs * vs):
                blk = coeff_blocks[bi]
                bi += 1
                diff = blk[0] - pred[cid]
                pred[cid] = blk[0]
                s = int(diff != 0) and int(abs(diff)).bit_length()
                code, ln = dc_codes[s]
                bw.put(code, ln)
                if s:
                    bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
                k = 1
                while k < 64:
                    run = 0
                    while k < 64 and blk[k] == 0:
                        run += 1
                        k += 1
                    if k == 64:
                        code, ln = ac_codes[0x00]  # EOB
                        bw.put(code, ln)
                        break
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    v = blk[k]
                    s = int(abs(v)).bit_length()
                    code, ln = ac_codes[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(v if v > 0 else v + (1 << s) - 1, s)
                    k += 1
    if bi != len(coeff_blocks):
        raise ValueError("coeff_blocks count does not match MCU geometry")
    out += bw.flush() + b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffing marker (EOI)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("jpeg: marker inside entropy data")
            self.acc, self.n = byte, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_idct_matrix():
    import numpy as np

    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0  # A[u, x]
    a[0, :] /= np.sqrt(2.0)
    return a


def _decode_jpeg(payload: bytes):
    """General baseline-sequential JPEG decode (grayscale or YCbCr with any
    sampling factors; grayscale output tripled to RGB). Samples are rounded
    half-up and clipped to uint8 per component plane BEFORE color
    conversion (standard integer-decoder behavior — and what makes the
    output an exact arithmetic function of the coefficients)."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                qtables[tq] = list(seg[sp + 1 : sp + 65])
                sp += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("jpeg: invalid sampling factors")
                comps.append((cid, (hs, vs), tq))
            if fw == 0 or fh == 0:
                raise ValueError("jpeg: zero frame dimension")
            sof = (fw, fh, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                codes = _jpeg_huff_codes(bits, vals)
                huff[(tc, th)] = {(ln, code): sym for sym, (code, ln) in codes.items()}
                sp += 17 + nv
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
            if ri:
                raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if sof is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            fw, fh, comps = sof
            byid = {cid: (samp, tq) for cid, samp, tq in comps}
            # validate every table/component reference up front: a corrupt
            # stream must raise ValueError (in _DECODE_ERRORS, so
            # on_error="skip" drops the file) — never KeyError mid-decode
            for cid, tdc, tac in scan:
                if cid not in byid:
                    raise ValueError("jpeg: scan component missing from SOF")
                if (0, tdc) not in huff or (1, tac) not in huff:
                    raise ValueError("jpeg: scan references undefined Huffman table")
                if byid[cid][1] not in qtables:
                    raise ValueError("jpeg: component references undefined quant table")
            hmax = max(s[0] for s, _ in byid.values())
            vmax = max(s[1] for s, _ in byid.values())
            if any(hmax % s[0] or vmax % s[1] for s, _ in byid.values()):
                raise ValueError("jpeg: non-divisible sampling factors unsupported")
            mcus_x, mcus_y = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
            # header-driven allocation bomb guard: SOF dimensions are
            # attacker-controlled and planes are allocated BEFORE any
            # entropy data is read — a two-byte flip declaring 65535×65535
            # would try ~34 GB/component, and MemoryError is (rightly) not
            # a skippable decode error. Cap padded pixels per plane.
            if (mcus_x * 8 * hmax) * (mcus_y * 8 * vmax) > (1 << 24):
                raise ValueError("jpeg: frame too large for this decoder")
            planes = {
                cid: np.zeros((mcus_y * 8 * vs, mcus_x * 8 * hs), dtype=np.float64)
                for cid, ((hs, vs), _) in byid.items()
            }
            idct = _jpeg_idct_matrix()
            br = _JpegBitReader(payload, pos + seg_len)
            pred = {cid: 0 for cid, _, _ in scan}
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for cid, tdc, tac in scan:
                        (hs, vs), tq = byid[cid]
                        q = qtables[tq]
                        for sb in range(hs * vs):
                            by, bx = sb // hs, sb % hs
                            zz = np.zeros(64, dtype=np.int64)
                            s = br.huff(huff[(0, tdc)])
                            if s > 11:  # 8-bit baseline DC category bound
                                raise ValueError("jpeg: invalid DC category")
                            diff = _jpeg_extend(br.bits(s), s) if s else 0
                            pred[cid] += diff
                            if abs(pred[cid]) > 2047:  # T.81 F.1.1.5.1 bound
                                raise ValueError("jpeg: DC coefficient out of range")
                            zz[0] = pred[cid] * q[0]
                            k = 1
                            while k < 64:
                                rs = br.huff(huff[(1, tac)])
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                run, size = rs >> 4, rs & 0xF
                                if size > 10:  # 8-bit baseline AC size bound
                                    raise ValueError("jpeg: invalid AC category")
                                k += run
                                if k > 63:
                                    raise ValueError("jpeg: AC index overflow")
                                zz[k] = _jpeg_extend(br.bits(size), size) * q[k]
                                k += 1
                            blk = np.zeros(64, dtype=np.float64)
                            blk[_JPEG_ZIGZAG] = zz
                            px = idct.T @ blk.reshape(8, 8) @ idct + 128.0
                            r0 = (my * vs + by) * 8
                            c0 = (mx * hs + bx) * 8
                            planes[cid][r0 : r0 + 8, c0 : c0 + 8] = px
            # half-up round + clip each component plane to uint8, then
            # replicate-upsample to the luma grid and color-convert
            for cid in planes:
                planes[cid] = np.clip(np.floor(planes[cid] + 0.5), 0, 255)
            full_h, full_w = mcus_y * 8 * vmax, mcus_x * 8 * hmax
            up = {}
            for cid, ((hs, vs), _) in byid.items():
                p = planes[cid]
                up[cid] = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)[
                    :full_h, :full_w
                ]
            ids = sorted(up)
            if len(ids) == 1:
                g = up[ids[0]][:fh, :fw]
                rgb = np.stack([g, g, g], axis=2)
            elif len(ids) == 3:
                y, cb, cr = (up[i][:fh, :fw] for i in ids)
                r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
                gg = np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)
                b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
                rgb = np.clip(np.stack([r, gg, b], axis=2), 0, 255)
            else:
                raise ValueError("jpeg: unsupported component count")
            return fw, fh, rgb.astype(np.uint8)
        elif marker == 0xD9:  # EOI before SOS
            break
        pos += seg_len
    raise ValueError("jpeg: no scan data found")


def _jpeg_mode(mid: int) -> str:
    return ("gray", "444", "420")[mid % 3]


def _jpeg_dims(mid: int) -> tuple[int, int]:
    """9-21 × 9-19 px: spans multiple MCUs (incl. 4:2:0's 16×16) and always
    exercises right/bottom partial-block crop."""
    return 9 + (mid % 13), 9 + ((mid * 7) % 11)


def jpegs_from_ids(ids: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic REAL baseline-JPEG table: per block, the quantized DC
    coefficient is ``stream_byte - 128`` (AC all zero) where the stream is
    the md5 chain of ``f"{seed}|jpg|{id}|{k}"`` — one byte per block in scan
    interleave order. With the flat ×16 quant table the decoded component
    sample for a block's pixels is EXACTLY ``clamp(2*byte - 128, 0, 255)``
    (IDCT of a DC-only block is flat at dc*Q0/8), so the driver oracle can
    re-derive every pixel arithmetically without running a decoder — while
    the decode path still exercises the full general machinery (marker walk,
    Huffman DC diffs, dequant, IDCT, 4:2:0 upsample, color convert, crop)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = _jpeg_dims(mid)
                mode = _jpeg_mode(mid)
                comps, _, mcus_x, mcus_y = _jpeg_mode_geometry(w, h, mode)
                bpm = sum(hs * vs for _, (hs, vs) in comps)
                n_blocks = mcus_x * mcus_y * bpm
                stream = _image_pixel_stream(f"{seed}|jpg", mid, n_blocks)
                blocks = [[b - 128] + [0] * 63 for b in stream]
                rows.append(
                    {
                        "media_id": mid,
                        "media": _encode_jpeg(w, h, mode, blocks),
                        "mime": "image/jpeg",
                        "meta": {"w": str(w), "h": str(h), "mode": mode, "seed": str(seed)},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "mime", "meta"])

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _audio_sample_count(mid: int) -> int:
    """Deterministic small per-id sample count (16-48, mono)."""
    return 16 + (mid % 5) * 8


def _audio_rate(mid: int) -> int:
    return 8000 * (1 + mid % 3)


def _encode_wav(sample_rate: int, pcm: bytes) -> bytes:
    """Minimal canonical RIFF/WAVE container: PCM (format 1), mono,
    16-bit little-endian — fmt chunk then data chunk."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def audio_from_ids(ids: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic REAL audio table keyed by an ``id`` column: valid
    mono PCM-16 WAV files whose samples are the md5 stream of
    ``f"{seed}|wav|{id}|{k}"`` read as little-endian int16 — same
    independent-derivation oracle story as ``images_from_ids``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                n, sr = _audio_sample_count(mid), _audio_rate(mid)
                pcm = b""
                k = 0
                while len(pcm) < n * 2:
                    pcm += hashlib.md5(f"{seed}|wav|{mid}|{k}".encode()).digest()
                    k += 1
                rows.append(
                    {
                        "media_id": mid,
                        "media": _encode_wav(sr, pcm[: n * 2]),
                        "mime": "audio/wav",
                        "meta": {"sr": str(sr), "n": str(n), "seed": str(seed)},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "mime", "meta"])

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("samples", ArrayType(FloatType())),
    ]
)


def _decode_wav(payload: bytes):
    """RIFF/WAVE chunk walk (chunks pad to even length per the spec):
    requires PCM (format 1) 16-bit; returns (sample_rate, channels,
    np.int16 samples interleaved)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sr, ch, data = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        pos += 8
        if tag == b"fmt ":
            afmt, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", payload, pos)
            if afmt != 1 or bits != 16 or ch == 0:
                raise ValueError(f"unsupported WAV: format={afmt} bits={bits} channels={ch}")
        elif tag == b"data":
            if pos + ln > len(payload):
                raise ValueError("WAV data chunk truncated")
            data = payload[pos : pos + ln]
        pos += ln + (ln & 1)
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, ch, np.frombuffer(data, dtype="<i2")


def decode_audio(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL audio decode: mono/interleaved PCM-16 WAV → raw int16 sample
    values as ARRAY<FLOAT> (no normalization — callers choose their
    scaling; exact int16 values keep the driver oracle arithmetic exact).
    Same Arrow ``mapInPandas`` shape as ``decode_image``; compressed audio
    (mp3/ogg) would need codec libs and raises (or skips)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    sr, ch, samples = _decode_wav(payload)
                except _DECODE_ERRORS:
                    if on_error == "skip":
                        continue
                    raise
                out.append(
                    (int(mid), int(sr), int(ch), len(samples) // ch,
                     samples.astype("float32").tolist())
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return media.select("media_id", "media").mapInPandas(kernel, schema=AUDIO_SCHEMA)


def _video_frame_count(mid: int) -> int:
    return 4 + (mid % 5) * 2


def _video_fps(mid: int) -> int:
    return 5 * (1 + mid % 3)


def _encode_y4m(w: int, h: int, fps: int, frames: bytes) -> bytes:
    """Minimal spec-valid YUV4MPEG2 stream: plain-text stream header, then
    per frame a ``FRAME\\n`` marker + raw 4:4:4 planes (Y, U, V — w*h bytes
    each). C444 keeps plane geometry trivial; the chroma-subsampled
    variants are a plane-size change, not a structural one."""
    n = w * h * 3
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()
    return hdr + b"".join(
        b"FRAME\n" + frames[i : i + n] for i in range(0, len(frames), n)
    )


def videos_from_ids(ids: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic REAL video table keyed by an ``id`` column: valid
    YUV4MPEG2 (.y4m) streams — the uncompressed interchange format every
    ffmpeg/mplayer accepts — with per-id frame count and frame rate, plane
    bytes the md5 stream of ``f"{seed}|y4m|{id}|{k}"``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = image_dims(mid)
                nf, fps = _video_frame_count(mid), _video_fps(mid)
                total = nf * w * h * 3
                buf = b""
                k = 0
                while len(buf) < total:
                    buf += hashlib.md5(f"{seed}|y4m|{mid}|{k}".encode()).digest()
                    k += 1
                rows.append(
                    {
                        "media_id": mid,
                        "media": _encode_y4m(w, h, fps, buf[:total]),
                        "mime": "video/x-yuv4mpeg",
                        "meta": {"w": str(w), "h": str(h), "fps": str(fps),
                                 "frames": str(nf), "seed": str(seed)},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "mime", "meta"])

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts", DoubleType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("planes", ArrayType(FloatType())),
    ]
)


def _parse_y4m(payload: bytes):
    """YUV4MPEG2 header + FRAME walk. Scope: C444 (or absent C tag defaults
    to 420 → rejected — honest, not silent garbage), integer frame rate.
    Returns (w, h, fps, frames: list of zero-copy np.uint8 views, one
    per frame, each 3*w*h bytes)."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    eol = payload.index(b"\n")
    w = h = fps_num = fps_den = None
    colorspace = "C420"  # spec default when the C tag is absent
    for tok in payload[9:eol].split():
        t = tok.decode()
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif t[0] == "C":
            colorspace = t
    if not w or not h or not fps_num:
        raise ValueError("Y4M header missing W/H/F")
    if colorspace != "C444":
        raise ValueError(f"unsupported Y4M colorspace {colorspace} (need C444)")
    if fps_den != 1:
        raise ValueError(f"unsupported non-integer frame rate F{fps_num}:{fps_den}")
    n = w * h * 3
    frames, pos = [], eol + 1
    while pos < len(payload):
        fe = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        pos = fe + 1
        if pos + n > len(payload):
            raise ValueError("Y4M truncated frame")
        frames.append(np.frombuffer(payload, np.uint8, n, pos))
        pos += n
    # zero-copy views into the payload — the caller strides BEFORE copying,
    # so an hour-long stream sampled every N seconds never materializes the
    # unsampled frames
    return w, h, fps_num, frames


def sample_video_frames(
    media: DataFrame, every_n_seconds: float, on_error: str = "raise"
) -> DataFrame:
    """REAL video frame sampling for YUV4MPEG2 (.y4m) payloads — the
    uncompressed format a pure numpy/stdlib kernel can walk; compressed
    containers (mp4/webm) still need pyav/ffmpeg and raise (or skip).

    Samples every ``max(1, floor(every_n_seconds * fps + 0.5))``-th frame
    (frame-domain stride — half-up rounding, NOT banker's, so external
    engines replay the stride exactly). One output row per sampled frame:
    (media_id, frame_idx, frame_ts = idx/fps, n_frames, fps, w, h,
    planes ARRAY<FLOAT> = raw Y,U,V 4:4:4 bytes). Arrow ``mapInPandas``,
    same distributed shape as ``decode_image``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    w, h, fps, frames = _parse_y4m(payload)
                except _DECODE_ERRORS:
                    if on_error == "skip":
                        continue
                    raise
                step = max(1, int(every_n_seconds * fps + 0.5))
                for idx in range(0, len(frames), step):
                    out.append(
                        (int(mid), idx, float(idx) / fps, len(frames), fps, w, h,
                         frames[idx].astype("float32").tolist())
                    )
            yield pd.DataFrame(out, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields])

    return media.select("media_id", "media").mapInPandas(kernel, schema=VIDEO_FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Native byte-level stats — no Python: length + mime grouping."""
    return (
        media.groupBy("mime")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.length("media")).cast("long").alias("total_bytes"),
        )
    )
