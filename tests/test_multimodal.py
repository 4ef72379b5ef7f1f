"""Multimodal plumbing tests: decode metadata, resize passthrough,
cardinality-expanding frame sampling. The codecs are stubbed (no media
libs in this container) — these tests pin the Spark-side contract:
schemas, batch shapes, row cardinality, binary round-trips."""

from __future__ import annotations

import pytest

from octopufs_spark.llm import multimodal
from octopufs_spark.tables import load
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.documents_as_media(
        load(spark, SF_DIR, "documents").limit(50)
    ).cache()


def test_decode_metadata(spark, media):
    out = multimodal.decode_media(media, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.byte_len > 0
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480
        assert len(r.checksum) == 32


def test_decode_real_codec_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        multimodal.decode_media(media, fake=False).collect()


def test_resize_passthrough(spark, media):
    out = multimodal.resize_media(media, 224, 224, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.width == 224 and r.height == 224 for r in rows)
    # payload preserved byte-for-byte by the fake backend
    orig = {r.doc_id: bytes(r.payload) for r in media.collect()}
    assert all(bytes(r.payload) == orig[r.doc_id] for r in rows)


def test_frame_sampling_cardinality(spark, media):
    out = multimodal.sample_frames(media, every_n_bytes=64, fake=True)
    frames = out.collect()
    sizes = {r.doc_id: len(bytes(r.payload)) for r in media.collect()}
    import math

    expected = sum(max(math.ceil(n / 64), 1) for n in sizes.values())
    assert len(frames) == expected
    # frames reassemble to the original payload
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append((r.frame_no, bytes(r.payload)))
    orig = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for doc_id, parts in by_doc.items():
        assert b"".join(p for _, p in sorted(parts)) == orig[doc_id]
