"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio decode libraries are not in this container, so the
decode step is STUBBED (``decode_image``/``decode_audio`` raise
``NotImplementedError``) — but the Spark-side plumbing is real and
tested: binary columns, Arrow-batched ``mapInPandas`` with an explicit
output schema, and deterministic fake feature extraction
(``fake_image_features``) whose arithmetic derives only from the byte
payload, so an external oracle can verify the pipeline end to end.

At 100 TB: payloads stay opaque ``binary`` columns in parquet;
``mapInPandas`` processes Arrow batches (no per-row Python overhead);
decode CPU dominates, so you repartition by payload-size salting to
balance, never by collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

IMAGE_FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, width BIGINT, height BIGINT, "
    "channels BIGINT, aspect DOUBLE"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, n_frames BIGINT, sample_rate BIGINT, "
    "duration_s DOUBLE"
)


def decode_image(data: bytes):
    """Real image decode — STUB: image libs (PIL/opencv) are not in this
    environment. The pipeline uses ``fake_image_features`` instead."""
    raise NotImplementedError("image decoding requires PIL/opencv (not installed)")


def decode_audio(data: bytes):
    """Real audio decode — STUB (no soundfile/librosa in environment)."""
    raise NotImplementedError("audio decoding requires an audio codec library")


def fake_image_features(data: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic fake 'decode': metadata derived from payload length
    only, so it's reproducible in SQL (octet_length arithmetic)."""
    n = len(data)
    width = n % 640 + 1
    height = n % 480 + 1
    return n, width, height, 3, width / height


def image_features_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload binary) → IMAGE_FEATURES_SCHEMA.
    Operates on whole Arrow batches; Python cost is one vectorized pass."""
    for pdf in batches:
        feats = pdf["payload"].map(fake_image_features)
        out = pd.DataFrame(
            feats.tolist(),
            columns=["n_bytes", "width", "height", "channels", "aspect"],
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def audio_features_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload binary) → AUDIO_FEATURES_SCHEMA.
    Fake frame-sampling: 1024-byte frames at a nominal 16 kHz rate."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": n.values,
                "n_frames": (n // 1024 + 1).values,
                "sample_rate": 16000,
                "duration_s": ((n // 1024 + 1) * 1024 / 16000.0).values,
            }
        )
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
