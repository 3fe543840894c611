"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image and audio METADATA decode are REAL: ``parse_image_header``
(imagehdr.py, pure stdlib) reads width/height/channels from
PNG/GIF/BMP/JPEG magic bytes, ``parse_wav_header`` (audiohdr.py) reads
sample rate/channels/frame count from RIFF/WAVE chunks, and the
``multimodal_image_features`` / ``multimodal_audio_features`` entries
run them over committed binary fixtures of real files
(refdata/{image,audio}_fixture.parquet, tools/gen_*_fixture.py). Full
PIXEL/SAMPLE decode remains STUBBED (``decode_image_pixels``/
``decode_audio`` raise ``NotImplementedError`` — PIL/opencv/soundfile
are not in this container); non-media payload paths keep deterministic
length-derived fakes whose arithmetic an external SQL oracle can
reproduce, so the Arrow plumbing stays verified end to end either way.

At 100 TB: payloads stay opaque ``binary`` columns in parquet;
``mapInPandas`` processes Arrow batches (no per-row Python overhead);
decode CPU dominates, so you repartition by payload-size salting to
balance, never by collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from .audiohdr import parse_wav_header
from .imagehdr import parse_image_header

IMAGE_FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, width BIGINT, height BIGINT, "
    "channels BIGINT, aspect DOUBLE"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, n_frames BIGINT, sample_rate BIGINT, "
    "channels BIGINT, duration_s DOUBLE"
)


def decode_image(data: bytes):
    """Header-level image decode — REAL, stdlib-only: (fmt, width,
    height, channels) parsed from PNG/GIF/BMP/JPEG magic bytes
    (imagehdr.py). Raises ValueError for unrecognized payloads."""
    hdr = parse_image_header(data)
    if hdr is None:
        raise ValueError("unrecognized image payload (not PNG/GIF/BMP/JPEG)")
    return hdr


def decode_image_pixels(data: bytes):
    """Full pixel decode — STUB: pixel codecs (PIL/opencv) are not in
    this environment; header metadata (``decode_image``) is real."""
    raise NotImplementedError("pixel decoding requires PIL/opencv (not installed)")


def decode_audio_header(data: bytes):
    """Header-level audio decode — REAL, stdlib-only: (sample_rate,
    channels, bits, n_frames) parsed from the RIFF/WAVE container
    (audiohdr.py). Raises ValueError for non-WAV payloads."""
    hdr = parse_wav_header(data)
    if hdr is None:
        raise ValueError("unrecognized audio payload (not PCM WAV)")
    return hdr


def decode_audio(data: bytes):
    """Sample-level audio decode — STUB (no soundfile/librosa in this
    environment); header metadata (``decode_audio_header``) is real."""
    raise NotImplementedError("audio sample decoding requires an audio codec library")


def fake_image_features(data: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic fake 'decode': metadata derived from payload length
    only, so it's reproducible in SQL (octet_length arithmetic)."""
    n = len(data)
    width = n % 640 + 1
    height = n % 480 + 1
    return n, width, height, 3, width / height


def image_features(data: bytes) -> tuple[int, int, int, int, float]:
    """(n_bytes, width, height, channels, aspect): REAL header parse for
    recognized image payloads; length-derived deterministic fake for
    anything else (keeps the plumbing entries that feed text bytes
    through this path oracle-checkable)."""
    hdr = parse_image_header(data)
    if hdr is None:
        return fake_image_features(data)
    _, width, height, channels = hdr
    return len(data), width, height, channels, width / height


def image_features_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload binary) → IMAGE_FEATURES_SCHEMA.
    Operates on whole Arrow batches; Python cost is one vectorized pass."""
    for pdf in batches:
        feats = pdf["payload"].map(image_features)
        out = pd.DataFrame(
            feats.tolist(),
            columns=["n_bytes", "width", "height", "channels", "aspect"],
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def audio_features(data: bytes) -> tuple[int, int, int, int, float]:
    """(n_bytes, n_frames, sample_rate, channels, duration_s): REAL
    RIFF/fmt/data header parse for WAV payloads; the legacy
    length-derived fake (channels fixed at 1) for anything else, so
    non-audio bytes still flow through the plumbing deterministically."""
    hdr = parse_wav_header(data)
    if hdr is None:
        n = len(data)
        frames = n // 1024 + 1
        return n, frames, 16000, 1, frames * 1024 / 16000.0
    sample_rate, channels, _bits, n_frames = hdr
    return len(data), n_frames, sample_rate, channels, n_frames / sample_rate


def audio_features_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload binary) → AUDIO_FEATURES_SCHEMA.
    Operates on whole Arrow batches; Python cost is one vectorized pass."""
    for pdf in batches:
        feats = pdf["payload"].map(audio_features)
        out = pd.DataFrame(
            feats.tolist(),
            columns=["n_bytes", "n_frames", "sample_rate", "channels", "duration_s"],
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


RESIZE_SCHEMA = (
    "doc_id BIGINT, width BIGINT, height BIGINT, out_width BIGINT, "
    "out_height BIGINT, out_pixels BIGINT"
)

RESIZE_TARGET = 256

VIDEO_FRAMES_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, byte_offset BIGINT"

VIDEO_FRAME_BYTES = 64
VIDEO_SAMPLE_EVERY = 3


def resize_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: fake resize-to-fit RESIZE_TARGET on the longest
    edge, aspect preserved, integer arithmetic (so an external SQL oracle
    reproduces it). A real implementation swaps the arithmetic for
    PIL.Image.thumbnail on the decoded payload — the batch shape, schema,
    and partitioning are identical."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        w = n % 640 + 1
        h = n % 480 + 1
        long_edge = pd.concat([w, h], axis=1).max(axis=1)
        out_w = (w * RESIZE_TARGET) // long_edge
        out_h = (h * RESIZE_TARGET) // long_edge
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "width": w.values,
                "height": h.values,
                "out_width": out_w.values,
                "out_height": out_h.values,
                "out_pixels": (out_w * out_h * 3).values,
            }
        )


def video_frames_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body, one→many: sample every VIDEO_SAMPLE_EVERY-th
    frame of a fake VIDEO_FRAME_BYTES-per-frame payload. Demonstrates the
    row-expanding UDF shape (frame extraction) with bounded memory — one
    output batch per input batch, rows proportional to sampled frames."""
    for pdf in batches:
        ids, idxs, offs = [], [], []
        for doc_id, payload in zip(pdf["doc_id"].values, pdf["payload"].values):
            n_frames = len(payload) // VIDEO_FRAME_BYTES + 1
            for i in range(0, n_frames, VIDEO_SAMPLE_EVERY):
                ids.append(doc_id)
                idxs.append(i)
                offs.append(i * VIDEO_FRAME_BYTES)
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "byte_offset": offs})
