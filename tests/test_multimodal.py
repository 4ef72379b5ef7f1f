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


@pytest.mark.slow  # >15 s; excluded from the default driver-window run
def test_decode_audio_real_wav(spark):
    """REAL codec path: stdlib wave-encoded PCM payloads decode to
    correct channel/rate/frame/duration/peak metadata through the same
    Arrow-batched mapInPandas plumbing the stubbed codecs use."""
    import io
    import wave

    import numpy as np

    from octopufs_spark.llm import multimodal

    def make_wav(doc_id, sr, n_frames, peak):
        t = np.arange(n_frames)
        samples = (peak * np.sin(2 * np.pi * 440 * t / sr)).astype("<i2")
        samples[0] = peak  # pin the exact peak regardless of phase
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(samples.tobytes())
        return (doc_id, bytearray(buf.getvalue()))

    rows = [make_wav(1, 16000, 16000, 1000), make_wav(2, 8000, 2000, 30000)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.decode_audio(df).collect()}
    assert got[1].sample_rate == 16000 and got[1].n_frames == 16000
    assert got[1].duration_ms == 1000 and got[1].n_channels == 1
    assert got[1].peak_amplitude == 1000
    assert got[2].duration_ms == 250 and got[2].peak_amplitude == 30000


def test_decode_png_real_distributed(spark):
    """Real PNG decode path (pure stdlib, no PIL): synthesize spec-
    correct PNGs with varied scanline filters, decode them distributed
    via mapInPandas, and check exact dimensions and integer channel
    means against the known pixel data."""
    from octopufs_spark.llm.multimodal import decode_images_png, encode_png

    imgs = []
    expected = {}
    for doc_id, (w, h) in enumerate([(16, 9), (7, 5), (32, 2)]):
        rows = [
            bytes(((x * 31 + y * 17 + c * 11 + doc_id) % 256) for x in range(w) for c in range(3))
            for y in range(h)
        ]
        filters = [(y % 3) for y in range(h)]  # cycle None/Sub/Up
        imgs.append((doc_id, bytearray(encode_png(w, h, rows, filters))))
        px = b"".join(rows)
        n = w * h
        expected[doc_id] = (w, h, tuple(sum(px[c::3]) // n for c in range(3)))
    df = spark.createDataFrame(imgs, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in decode_images_png(df).collect()}
    assert len(got) == 3
    for doc_id, (w, h, means) in expected.items():
        r = got[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == means


def test_decode_png_paeth_and_average_filters(spark):
    """Filters 3 (Average) and 4 (Paeth) aren't produced by our
    encoder, so craft them directly per the PNG spec and confirm the
    un-filter reconstruction."""
    import struct
    import zlib

    from octopufs_spark.llm.multimodal import _PNG_SIG, _png_chunk, decode_png

    w, h, bpp = 4, 3, 3
    stride = w * bpp
    rows = [bytes(((x * 23 + y * 41) % 256) for x in range(stride)) for y in range(h)]

    def filt_avg(row, prev):
        return bytes(
            (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2)) & 0xFF
            for i in range(stride)
        )

    def filt_paeth(row, prev):
        out = bytearray()
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    raw = b"\x00" + rows[0]
    raw += b"\x03" + filt_avg(rows[1], rows[0])
    raw += b"\x04" + filt_paeth(rows[2], rows[1])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    dw, dh, ch, px = decode_png(png)
    assert (dw, dh, ch) == (w, h, 3)
    assert px == b"".join(rows)


def test_decode_png_gray_and_rgba():
    """Gray (ctype 0) and RGBA (ctype 6) decode paths: craft minimal
    spec-correct files and check exact reconstruction."""
    import struct
    import zlib

    from octopufs_spark.llm.multimodal import _PNG_SIG, _png_chunk, decode_png

    # 3x2 grayscale, filter 0
    gray_rows = [bytes([10, 200, 30]), bytes([0, 255, 128])]
    raw = b"".join(b"\x00" + r for r in gray_rows)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    png = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    w, h, ch, px = decode_png(png)
    assert (w, h, ch) == (3, 2, 1) and px == b"".join(gray_rows)

    # 2x2 RGBA with a Sub-filtered second row
    rgba_rows = [bytes(range(8)), bytes(range(100, 108))]
    bpp = 4
    sub = bytes((rgba_rows[1][i] - (rgba_rows[1][i - bpp] if i >= bpp else 0)) & 0xFF for i in range(8))
    raw = b"\x00" + rgba_rows[0] + b"\x01" + sub
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    png = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    w, h, ch, px = decode_png(png)
    assert (w, h, ch) == (2, 2, 4) and px == b"".join(rgba_rows)


def test_decode_png_rejects_garbage():
    import pytest as _pytest

    from octopufs_spark.llm.multimodal import decode_png

    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_resize_png_pixel_exact():
    """Nearest-neighbor resize on a known 4x4 checker: dst pixel (x,y)
    must equal src pixel (x*src//dst, y*src//dst) exactly."""
    from octopufs_spark.llm.multimodal import decode_png, encode_png, resize_png

    # 4x4 RGB: pixel (x, y) = (16x, 16y, x+y) — distinct per position
    rows = [
        bytes(b for x in range(4) for b in (16 * x, 16 * y, x + y)) for y in range(4)
    ]
    png = encode_png(4, 4, rows)

    # Downscale 4->2: samples src (0,0), (2,0), (0,2), (2,2)
    w, h, ch, px = decode_png(resize_png(png, 2, 2))
    assert (w, h, ch) == (2, 2, 3)
    expect = bytes(
        b for y in (0, 2) for x in (0, 2) for b in (16 * x, 16 * y, x + y)
    )
    assert px == expect

    # Upscale 2->4 replicates each pixel into a 2x2 block
    up_w, up_h, up_ch, up_px = decode_png(resize_png(resize_png(png, 2, 2), 4, 4))
    assert (up_w, up_h, up_ch) == (4, 4, 3)
    for y in range(4):
        for x in range(4):
            got = up_px[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]
            assert got == expect[((y // 2) * 2 + (x // 2)) * 3 :][:3]


def test_resize_png_gray_promotes_to_rgb():
    import struct
    import zlib

    from octopufs_spark.llm.multimodal import _PNG_SIG, _png_chunk, decode_png, resize_png

    gray_rows = [bytes([10, 200]), bytes([0, 255])]
    raw = b"".join(b"\x00" + r for r in gray_rows)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(resize_png(png, 2, 2))
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes(v for g in (10, 200, 0, 255) for v in (g, g, g))
