"""Multimodal plumbing + query-side plans over the fixture triple store."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.operators.multimodal import (
    decode_features,
    generate_media,
    media_stats,
)


def test_media_roundtrip_deterministic(spark):
    a = {r.media_id: (bytes(r.media), r.mime) for r in generate_media(spark, 20, partitions=2).collect()}
    b = {r.media_id: (bytes(r.media), r.mime) for r in generate_media(spark, 20, partitions=5).collect()}
    assert a == b
    assert len(a) == 20


def test_decode_features_stub(spark):
    media = generate_media(spark, 12)
    feats = decode_features(media, dim=8).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)
        assert r.n_bytes > 0
    # digest matches an independent python computation
    payloads = {r.media_id: bytes(r.media) for r in media.collect()}
    for r in feats:
        assert r.digest == hashlib.md5(payloads[r.media_id]).hexdigest()


def test_media_stats_native(spark):
    stats = {r.mime: (r.n, r.total_bytes) for r in media_stats(generate_media(spark, 30)).collect()}
    assert sum(n for n, _ in stats.values()) == 30
    assert set(stats) == {"image/png", "audio/wav", "video/mp4"}


def test_paper_details_query(spark):
    """G1-G4/G7 over the golden fixture store."""
    import os

    import pytest

    fixture = "/root/reference/extremexp_kg_matic/data/five_papers.json"
    if not os.path.exists(fixture):
        pytest.skip("no reference fixture")
    from extremexp_knowledge_graph_spark.operators.papers_to_triples import papers_to_triples
    from extremexp_knowledge_graph_spark.plans.queries import (
        count_by_class,
        count_by_predicate,
        paper_details,
    )
    from extremexp_knowledge_graph_spark.sources.papers_json import read_papers_json

    triples = papers_to_triples(read_papers_json(spark, fixture)).cache()
    rows = paper_details(triples, limit=10).collect()
    assert len(rows) == 5  # fixture has 5 papers
    years = [r.year for r in rows]
    assert years == sorted(years, reverse=True)  # ordered by year desc
    assert all(r.title and r.pdfUrl for r in rows)

    filtered = paper_details(triples, title_contains="transformer").collect()
    assert {r.title for r in filtered} == {
        "Swin Transformer: Hierarchical Vision Transformer using Shifted Windows",
        "Informer: Beyond Efficient Transformer for Long Sequence Time-Series Forecasting",
    }

    by_class = {r["class"]: r.n for r in count_by_class(triples).collect()}
    assert by_class["http://extremexp.eu/ontology/matic_papers/ReportedResult"] == 224
    assert by_class["http://extremexp.eu/ontology/matic_papers/Paper"] == 5
    total = sum(r.n for r in count_by_predicate(triples).collect())
    assert total == 2815


def test_decode_image_roundtrip_exact(spark):
    """Real codec path: generate valid PPM/BMP/PNG files, decode, and
    require BYTE-EXACT pixel recovery against the generator's md5 stream —
    BMP's bottom-up rows, 4-byte padding and BGR order, and PNG's zlib
    inflate + scanline unfiltering must all be undone."""
    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _image_pixel_stream,
        decode_image,
        generate_images,
        image_dims,
    )

    media = generate_images(spark, 24, seed=7)
    rows = {r.media_id: r for r in decode_image(media).collect()}
    assert len(rows) == 24
    fmts = ["ppm", "bmp", "png"]
    for mid in range(24):
        w, h = image_dims(mid)
        want = list(_image_pixel_stream(7, mid, w * h * 3))
        r = rows[mid]
        assert (r.fmt, r.src_w, r.src_h, r.w, r.h) == (fmts[mid % 3], w, h, w, h)
        assert [int(v) for v in r.pixels] == want, mid


def test_png_all_filters_roundtrip():
    """Every PNG scanline predictor (None/Sub/Up/Average/Paeth) decodes
    byte-exactly, including a tall image where each row uses a different
    filter, and an RGBA image (alpha dropped). CRC corruption is caught."""
    import numpy as np
    import pytest as _pytest

    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
        _image_pixel_stream,
    )

    w, h = 5, 10  # tall enough that rows 0-9 cycle through all 5 filters
    rgb = _image_pixel_stream(3, 99, w * h * 3)
    for f in range(5):  # uniform filter per image
        dw, dh, arr = _decode_png(_encode_png(w, h, rgb, lambda r, ff=f: ff))
        assert (dw, dh) == (w, h)
        assert arr.tobytes() == rgb, f"filter {f}"
    dw, dh, arr = _decode_png(_encode_png(w, h, rgb, lambda r: r % 5))
    assert arr.tobytes() == rgb

    corrupted = bytearray(_encode_png(w, h, rgb))
    corrupted[50] ^= 0xFF  # flip a byte inside IDAT
    with _pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(corrupted))

    # RGBA (color type 6): filters run at bpp=4; decoder strips alpha
    import struct
    import zlib

    from extremexp_knowledge_graph_spark.operators.multimodal import _png_chunk

    rgba = _image_pixel_stream(4, 5, w * h * 4)
    raw = bytearray()
    prev = bytes(w * 4)
    for r in range(h):
        line = rgba[r * w * 4 : (r + 1) * w * 4]
        raw.append(2)  # Up filter throughout
        raw += bytes((line[x] - prev[x]) & 0xFF for x in range(w * 4))
        prev = line
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    dw, dh, arr = _decode_png(payload)
    want = np.frombuffer(rgba, np.uint8).reshape(h, w, 4)[:, :, :3]
    assert np.array_equal(arr, want)


def test_gif_lzw_roundtrip():
    """Our GIF LZW: variable-width codes (bumps at every power of two up
    to 12 bits), KwKwK, and the 4096-entry table reset must all roundtrip."""
    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _image_pixel_stream,
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    cases = [
        b"",
        b"\x00",
        b"aaaaaaaa",                       # KwKwK immediately
        b"abcabcabcabc",
        bytes(range(256)) * 3,             # crosses the 9->10 bit boundary
        b"\x07" * 1000,                    # long single-symbol run
        _image_pixel_stream(3, 9, 20000),  # incompressible: full table + reset
    ]
    for data in cases:
        assert _lzw_decode_gif(_lzw_encode_gif(data)) == data, len(data)


def test_decode_gif_exact(spark):
    """GIF87a through Spark: pixel indices (md5 stream) map through the
    identity-gray palette; decoded RGB = each index byte tripled."""
    import numpy as np

    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _image_pixel_stream,
        decode_image,
        gifs_from_ids,
        image_dims,
    )

    rows = {r.media_id: r for r in decode_image(gifs_from_ids(spark.range(9), seed=7)).collect()}
    for mid in range(9):
        w, h = image_dims(mid)
        idx = np.frombuffer(_image_pixel_stream(7, mid, w * h), np.uint8)
        r = rows[mid]
        assert (r.fmt, r.w, r.h) == ("gif", w, h)
        assert [int(v) for v in r.pixels] == np.repeat(idx, 3).tolist(), mid


def test_decode_audio_roundtrip_exact(spark):
    """WAV PCM-16 decode: generated files parse back to the exact int16
    sample stream (little-endian, signed), with rate/count metadata."""
    import numpy as np

    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _audio_rate,
        _audio_sample_count,
        audio_from_ids,
        decode_audio,
    )
    import hashlib

    media = audio_from_ids(spark.range(10), seed=9)
    rows = {r.media_id: r for r in decode_audio(media).collect()}
    assert len(rows) == 10
    for mid in range(10):
        n = _audio_sample_count(mid)
        pcm = b""
        k = 0
        while len(pcm) < n * 2:
            pcm += hashlib.md5(f"9|wav|{mid}|{k}".encode()).digest()
            k += 1
        want = np.frombuffer(pcm[: n * 2], dtype="<i2").tolist()
        r = rows[mid]
        assert (r.sample_rate, r.n_channels, r.n_samples) == (_audio_rate(mid), 1, n)
        assert [int(v) for v in r.samples] == want, mid


def test_sample_video_frames_exact(spark):
    """Y4M walk: generated streams parse back to the exact per-frame plane
    bytes; stride sampling = every max(1, floor(every*fps + 0.5)) frames."""
    import hashlib

    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _video_fps,
        _video_frame_count,
        image_dims,
        sample_video_frames,
        videos_from_ids,
    )

    media = videos_from_ids(spark.range(9), seed=13)
    rows = {}
    for r in sample_video_frames(media, every_n_seconds=0.25).collect():
        rows.setdefault(r.media_id, {})[r.frame_idx] = r
    for mid in range(9):
        w, h = image_dims(mid)
        nf, fps = _video_frame_count(mid), _video_fps(mid)
        step = max(1, int(0.25 * fps + 0.5))
        want_idx = list(range(0, nf, step))
        assert sorted(rows[mid]) == want_idx, mid
        total = nf * w * h * 3
        buf = b""
        k = 0
        while len(buf) < total:
            buf += hashlib.md5(f"13|y4m|{mid}|{k}".encode()).digest()
            k += 1
        for idx in want_idx:
            r = rows[mid][idx]
            assert (r.n_frames, r.fps, r.w, r.h) == (nf, fps, w, h)
            assert abs(r.frame_ts - idx / fps) < 1e-12
            want = list(buf[idx * w * h * 3 : (idx + 1) * w * h * 3])
            assert [int(v) for v in r.planes] == want, (mid, idx)


def test_sample_video_frames_on_error(spark):
    from extremexp_knowledge_graph_spark.operators.multimodal import sample_video_frames

    bad = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x18ftypmp42 not parseable"))],
        ["media_id", "media"],
    )
    assert sample_video_frames(bad, 1.0, on_error="skip").count() == 0


def test_decode_audio_on_error(spark):
    from extremexp_knowledge_graph_spark.operators.multimodal import decode_audio

    bad = spark.createDataFrame(
        [(1, bytearray(b"ID3 not a wav file"))], ["media_id", "media"]
    )
    assert decode_audio(bad, on_error="skip").count() == 0


def test_truncated_payloads_skip_cleanly(spark):
    """Corruption beyond a bad magic — truncated chunks (struct.error),
    corrupt DEFLATE (zlib.error) — must also honor on_error='skip', and
    valid rows in the same batch still decode."""
    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _encode_png,
        _encode_wav,
        _image_pixel_stream,
        decode_audio,
        decode_image,
    )

    good_png = _encode_png(2, 2, _image_pixel_stream(1, 1, 12))
    trunc_png = good_png[:20]                       # mid-IHDR: struct.error
    rot_idat = bytearray(good_png)
    rot_idat[45] ^= 0xFF                            # inside IDAT: CRC ValueError
    imgs = spark.createDataFrame(
        [(0, bytearray(good_png)), (1, bytearray(trunc_png)), (2, bytes(rot_idat))],
        ["media_id", "media"],
    )
    ok = decode_image(imgs, on_error="skip").collect()
    assert [r.media_id for r in ok] == [0]

    good_wav = _encode_wav(8000, b"\x01\x00" * 8)
    trunc_wav = good_wav[:24]                       # mid-fmt chunk: struct.error
    auds = spark.createDataFrame(
        [(0, bytearray(good_wav)), (1, bytearray(trunc_wav))], ["media_id", "media"]
    )
    ok = decode_audio(auds, on_error="skip").collect()
    assert [r.media_id for r in ok] == [0]


def test_decode_image_resize_nearest(spark):
    """Nearest-neighbor resize: output dims honored; each output pixel is
    the source pixel at floor(dst*src/out)."""
    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _image_pixel_stream,
        decode_image,
        generate_images,
        image_dims,
    )

    media = generate_images(spark, 6, seed=7)
    out = {r.media_id: r for r in decode_image(media, width=3, height=2).collect()}
    for mid in range(6):
        w, h = image_dims(mid)
        src = list(_image_pixel_stream(7, mid, w * h * 3))
        r = out[mid]
        assert (r.w, r.h) == (3, 2)
        got = [int(v) for v in r.pixels]
        want = []
        for rr in range(2):
            sr = (rr * h) // 2
            for cc in range(3):
                sc = (cc * w) // 3
                want.extend(src[3 * (sr * w + sc): 3 * (sr * w + sc) + 3])
        assert got == want, mid


def test_decode_image_on_error(spark):
    """Garbage payloads: raise by default, drop with on_error='skip'."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from extremexp_knowledge_graph_spark.operators.multimodal import decode_image

    bad = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG not supported"))], ["media_id", "media"]
    )
    assert decode_image(bad, on_error="skip").count() == 0
    with _pytest.raises(Exception):
        decode_image(bad).count()


# ---------------------------------------------------------------------------
# JPEG — baseline sequential, our own Huffman + IDCT
# ---------------------------------------------------------------------------
def test_jpeg_ac_path_vs_bruteforce_idct():
    """General entropy/AC coverage the DC-only driver fixtures don't give:
    a block with negative coefficients, long zero runs (forces ZRL), and a
    coefficient at k=63 (no EOB) must decode to EXACTLY the brute-force
    T.81 IDCT double loop — an implementation independent of the decoder's
    matrix formulation."""
    import math

    import numpy as np

    from extremexp_knowledge_graph_spark.operators import multimodal as M

    zz = [0] * 64
    zz[0], zz[1], zz[2], zz[20], zz[21], zz[40], zz[63] = 5, -3, 7, -1, 2, 9, -4
    w, h, arr = M._decode_jpeg(M._encode_jpeg(8, 8, "gray", [list(zz)]))
    assert (w, h) == (8, 8)

    nat = np.zeros((8, 8))
    for k, v in enumerate(zz):
        nat.flat[M._JPEG_ZIGZAG[k]] = v * 16  # flat ×16 quant table

    def cc(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    exp = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (cc(u) * cc(v) * nat[u, v]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            exp[x, y] = s / 4 + 128
    exp = np.clip(np.floor(exp + 0.5), 0, 255)
    assert np.array_equal(arr[:, :, 0].astype(float), exp)
    assert np.array_equal(arr[:, :, 0], arr[:, :, 2])  # gray tripled


def test_jpeg_dc_prediction_and_420_geometry():
    """Multi-MCU DC prediction chains per component + 4:2:0 sub-block
    placement: a 17x17 4:2:0 image (2x2 MCUs, right/bottom crop) whose
    blocks are DC-only must place each flat 8x8 where the sampling grid
    says, independently derived from the MCU walk."""
    import numpy as np

    from extremexp_knowledge_graph_spark.operators import multimodal as M

    w = h = 17
    comps, _, mx, my = M._jpeg_mode_geometry(w, h, "420")
    bpm = sum(hs * vs for _, (hs, vs) in comps)
    n = mx * my * bpm
    dcs = [((i * 37) % 256) - 128 for i in range(n)]  # varied diffs incl. sign flips
    payload = M._encode_jpeg(w, h, "420", [[d] + [0] * 63 for d in dcs])
    dw, dh, arr = M._decode_jpeg(payload)
    assert (dw, dh) == (w, h)

    clamp = lambda v: min(255, max(0, v))  # noqa: E731
    for r in range(h):
        for c in range(w):
            m = (r // 16) * mx + (c // 16)
            sub = ((r % 16) // 8) * 2 + ((c % 16) // 8)
            yv = clamp(2 * dcs[6 * m + sub] + 128)  # dc*16/8 = 2*dc
            cb = clamp(2 * dcs[6 * m + 4] + 128)
            cr = clamp(2 * dcs[6 * m + 5] + 128)
            import math
            expR = clamp(math.floor(yv + 1.402 * (cr - 128) + 0.5))
            assert arr[r, c, 0] == expR, (r, c)


def test_jpeg_scope_boundaries():
    """Progressive SOF2, 16-bit DQT, restart intervals, and truncated
    streams raise ValueError — honest scope, not silent garbage."""
    import struct

    import pytest as _pytest

    from extremexp_knowledge_graph_spark.operators import multimodal as M

    good = M._encode_jpeg(8, 8, "gray", [[1] + [0] * 63])
    assert M._decode_jpeg(good)[2].shape == (8, 8, 3)

    with _pytest.raises(ValueError):
        M._decode_jpeg(good[:24])  # truncated mid-segment
    with _pytest.raises(ValueError):
        M._decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))  # progressive
    # inject a DRI segment with nonzero interval before SOS
    sos_at = good.index(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
    with _pytest.raises(ValueError):
        M._decode_jpeg(good[:sos_at] + dri + good[sos_at:])


def test_jpeg_fuzz_only_decode_errors():
    """Hostile-corpus contract: ANY corruption of a valid JPEG (truncation,
    byte flips, segment deletion) must raise only _DECODE_ERRORS — the set
    decode_image(on_error='skip') survives — never KeyError/UnboundLocal/
    etc. Deterministic fuzz: 300 seeded mutations."""
    import random

    from extremexp_knowledge_graph_spark.operators import multimodal as M

    comps, _, mx, my = M._jpeg_mode_geometry(17, 17, "420")
    bpm = sum(hs * vs for _, (hs, vs) in comps)
    good = M._encode_jpeg(17, 17, "420", [[(i * 37) % 256 - 128] + [0] * 63
                                          for i in range(mx * my * bpm)])
    rng = random.Random(20260818)
    for trial in range(300):
        b = bytearray(good)
        op = trial % 3
        if op == 0:  # truncate
            b = b[: rng.randrange(2, len(b))]
        elif op == 1:  # flip 1-4 bytes
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:  # delete a slice
            i = rng.randrange(2, len(b) - 1)
            del b[i : i + rng.randrange(1, 40)]
        try:
            M._decode_jpeg(bytes(b))
        except M._DECODE_ERRORS:
            pass  # the contract: these are the ONLY acceptable exceptions
