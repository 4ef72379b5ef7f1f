"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata. The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signature,
partition-size control — is real and tested; the actual codec decode is
STUBBED (no image/audio libs in this container) behind
``decode_media_batch``: by default a clearly-marked
NotImplementedError, or a deterministic fake when ``fake=True`` so the
pipeline shape is verifiable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the decode step: metadata a real decoder would emit.
DECODE_SCHEMA = (
    "doc_id long, byte_len long, media_type string, width long, height long, checksum string"
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: fake width/height from size.

    STUB — replace with PIL/ffmpeg decode where available.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def decode_media_batch(fake: bool = True):
    """Build a mapInPandas function decoding a binary media column.

    Input rows: [doc_id: long, payload: binary, media_type: string].
    Arrow-batched: each pandas batch is decoded vectorized; at scale the
    input should be repartitioned so batches of large blobs fit executor
    memory (see repartition in decode_media).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            payloads = pdf["payload"]
            dims = payloads.map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return fn


def decode_media(
    media: DataFrame, fake: bool = True, target_partitions: int | None = None
) -> DataFrame:
    """Decode/feature-extract a media DataFrame [doc_id, payload, media_type].

    Repartitions first so blob batches are bounded per task — at 100 TB
    the blobs dominate memory, so partition count tracks input bytes,
    not row count.
    """
    if target_partitions:
        media = media.repartition(target_partitions)
    return media.mapInPandas(decode_media_batch(fake=fake), schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, media_type string, width long, height long"


def resize_media(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize image payloads to (width, height) — Arrow-batched mapInPandas.

    STUB codec: with ``fake=True`` the payload passes through and only
    the metadata reflects the target size (a real backend would decode,
    resample, re-encode). The Spark plumbing — batch iteration, binary
    columns both directions, schema — is the real contract.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires PIL — not in this container")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(fn, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_no long, payload binary"


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, fake: bool = True) -> DataFrame:
    """Sample frames from video payloads: one input row → N frame rows.

    Cardinality-expanding mapInPandas (the UDTF shape for binary data).
    STUB codec: with ``fake=True`` each ``every_n_bytes`` slice of the
    payload stands in for a decoded frame; a real backend would demux
    with ffmpeg and emit encoded frames. Output partitioning follows
    the input, so downstream per-frame feature extraction parallelizes
    without a shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame demux requires ffmpeg — not in this container")
            ids, frame_nos, payloads = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, max(len(raw), 1), every_n_bytes):
                    ids.append(doc_id)
                    frame_nos.append(i // every_n_bytes)
                    payloads.append(raw[i : i + every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_no": frame_nos, "payload": payloads})

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, n_channels long, sample_rate long, n_frames long, "
    "duration_ms long, peak_amplitude long"
)


def decode_audio_batch():
    """REAL audio decoder — no stub: stdlib ``wave`` parses RIFF/WAVE
    payloads (the one codec the standard library ships), numpy decodes
    the PCM frames. Proves the multimodal plumbing carries an actual
    codec end-to-end in this container; image/video stay env-gated on
    PIL/ffmpeg."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id",
                    "n_channels",
                    "sample_rate",
                    "n_frames",
                    "duration_ms",
                    "peak_amplitude",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    nch, sw = w.getnchannels(), w.getsampwidth()
                    sr, nf = w.getframerate(), w.getnframes()
                    raw = w.readframes(nf)
                dtype = {1: np.int8, 2: np.int16, 4: np.int32}[sw]
                samples = np.frombuffer(raw, dtype=dtype)
                rows["doc_id"].append(doc_id)
                rows["n_channels"].append(nch)
                rows["sample_rate"].append(sr)
                rows["n_frames"].append(nf)
                rows["duration_ms"].append(int(nf * 1000 / sr))
                rows["peak_amplitude"].append(
                    int(np.abs(samples.astype(np.int64)).max()) if len(samples) else 0
                )
            yield pd.DataFrame(rows)

    return fn


def decode_audio(media: DataFrame, target_partitions: int | None = None) -> DataFrame:
    """Decode WAV payloads [doc_id, payload] to audio metadata +
    peak amplitude. Same partition-size discipline as decode_media:
    blobs dominate memory, so partition count tracks bytes."""
    if target_partitions:
        media = media.repartition(target_partitions)
    return media.mapInPandas(decode_audio_batch(), schema=AUDIO_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests: treat utf-8 text bytes as an opaque payload."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )
