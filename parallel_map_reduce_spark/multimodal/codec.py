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
