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
    """Real codec path: generate valid PPM/BMP files, decode, and require
    BYTE-EXACT pixel recovery against the generator's md5 stream — BMP's
    bottom-up rows, 4-byte padding and BGR order must all be undone."""
    from extremexp_knowledge_graph_spark.operators.multimodal import (
        _image_pixel_stream,
        decode_image,
        generate_images,
        image_dims,
    )

    media = generate_images(spark, 24, seed=7)
    rows = {r.media_id: r for r in decode_image(media).collect()}
    assert len(rows) == 24
    for mid in range(24):
        w, h = image_dims(mid)
        want = list(_image_pixel_stream(7, mid, w * h * 3))
        r = rows[mid]
        assert (r.fmt, r.src_w, r.src_h, r.w, r.h) == (
            "ppm" if mid % 2 == 0 else "bmp", w, h, w, h)
        assert [int(v) for v in r.pixels] == want, mid


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
