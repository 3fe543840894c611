"""Stdlib WAV (RIFF/WAVE) header codec: parse sample rate / channels /
bit depth / frame count from the fmt and data chunks, plus a
deterministic builder for the committed audio fixture.

The same discipline as imagehdr.py (round 11): metadata decode is the
REAL, production-shaped pass a training pipeline runs before any
sample-level work, and it needs no codec library — the RIFF container
is pure ``struct``. Full sample decode (resampling, spectrograms)
still requires audio libs absent from this container and stays
stubbed in codec.py.

Parser contract: ``parse_wav_header(data)`` returns
``(sample_rate, channels, bits_per_sample, n_frames)`` or ``None``
when the payload is not a well-formed PCM WAV. ``n_frames`` derives
from the data chunk's byte length / block align — the authoritative
frame count for PCM.
"""

from __future__ import annotations

import struct


def parse_wav_header(data: bytes):
    """(sample_rate, channels, bits_per_sample, n_frames) for RIFF/WAVE
    payloads, or ``None`` if ``data`` is not a parseable PCM WAV."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return None
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i, n = 12, len(data)
    fmt = None
    data_size = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt " and size >= 16 and len(body) >= 16:
            audio_format, channels, sample_rate = struct.unpack("<HHI", body[:8])
            block_align, bits = struct.unpack("<HH", body[12:16])
            if audio_format != 1:  # PCM only
                return None
            fmt = (sample_rate, channels, bits, block_align)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    sample_rate, channels, bits, block_align = fmt
    if not (sample_rate > 0 and channels > 0 and bits > 0 and block_align > 0):
        return None
    return (sample_rate, channels, bits, data_size // block_align)


def build_wav(
    sample_rate: int,
    channels: int,
    n_frames: int,
    bits: int = 16,
    sample_byte: int = 0,
) -> bytes:
    """Fully valid PCM WAV: RIFF header + fmt + data chunk of constant
    ``sample_byte`` bytes (deterministic; a real player would render
    silence/DC)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = bytes([sample_byte % 256]) * (n_frames * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out)) + out
