"""Stdlib WAV (RIFF/WAVE) header codec: parse sample rate / channels /
bit depth / frame count from the fmt and data chunks, plus a
deterministic builder for the committed audio fixture.

The same discipline as imagehdr.py (round 11): metadata decode is the
REAL, production-shaped pass a training pipeline runs before any
sample-level work, and it needs no codec library — the RIFF container
is pure ``struct``. SAMPLE decode is real too for PCM
(``decode_wav_samples``: the data chunk IS the samples); compressed
audio has a real lossless decoder for FLAC (flacdec.py — r12); only
psychoacoustic codecs (MP3/AAC) remain out of scope.

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


def extract_wav_data(data: bytes):
    """(sample_rate, channels, bits, data_chunk_bytes) for a PCM WAV,
    or ``None`` — the raw interleaved sample bytes, exactly as stored.
    For PCM the data chunk IS the samples (no entropy coding), so full
    sample decode needs only this slice plus a dtype reinterpretation
    (codec.py:decode_wav_samples does int16)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return None
    data = bytes(data)
    hdr = parse_wav_header(data)
    if hdr is None:
        return None
    sample_rate, channels, bits, _n_frames = hdr
    i, n = 12, len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        if cid == b"data":
            return sample_rate, channels, bits, data[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    return None


def decode_wav_samples(data: bytes):
    """REAL sample decode for 8/16/24/32-bit integer PCM WAV:
    (sample_rate, channels, numpy array of shape (n_frames, channels))
    — int16 for depths <= 16, int32 for 24/32 (the flacdec.py dtype
    convention). 8-bit PCM is stored UNSIGNED with midpoint 128 (the
    RIFF convention) and comes back signed-centered; 24-bit is packed
    3-byte little-endian two's complement. Raises ValueError for other
    depths (float WAV is format code 3 and already rejected at parse)."""
    import numpy as np

    ext = extract_wav_data(data)
    if ext is None:
        raise ValueError("not a parseable PCM WAV")
    sample_rate, channels, bits, body = ext
    ba = (bits // 8) * channels
    if bits not in (8, 16, 24, 32) or ba == 0:
        raise ValueError(f"unsupported PCM sample depth {bits}")
    frames = len(body) // ba
    body = body[: frames * ba]
    if bits == 8:
        arr = np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 128
    elif bits == 16:
        arr = np.frombuffer(body, dtype="<i2")
    elif bits == 24:
        b3 = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        arr = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        arr = arr - ((arr & 0x800000) << 1)  # sign-extend bit 23
    else:  # 32
        arr = np.frombuffer(body, dtype="<i4")
    return sample_rate, channels, arr.reshape(frames, channels)


def wave_sample(frame: int, channel: int, base: int) -> int:
    """The audio fixture's deterministic int16 waveform: a zigzag ramp
    the generator evaluates WITHOUT parsing any payload (pure integer
    arithmetic), so expected sample statistics derive from this formula
    while the Spark side must walk the RIFF container to match."""
    return ((base * 31 + frame * 7 + channel * 13) % 4001) - 2000


def build_wav(
    sample_rate: int,
    channels: int,
    n_frames: int,
    bits: int = 16,
    sample_byte: int = 0,
    pattern: int | None = None,
) -> bytes:
    """Fully valid PCM WAV: RIFF header + fmt + data chunk. Default:
    constant ``sample_byte`` bytes (DC). With ``pattern=base`` the data
    chunk carries the ``wave_sample`` zigzag waveform: little-endian
    int16 at 16-bit, left-shifted by 8 into packed 3-byte samples at
    24-bit (mirroring the FLAC depth scaling), arithmetic-shifted down
    by 5 and stored unsigned-midpoint-128 at 8-bit — every variant a
    pure formula the fixture generator can evaluate without this
    builder."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    if pattern is None:
        data = bytes([sample_byte % 256]) * (n_frames * block_align)
    else:
        if bits == 16:
            data = b"".join(
                struct.pack("<h", wave_sample(f, ch, pattern))
                for f in range(n_frames)
                for ch in range(channels)
            )
        elif bits == 24:
            data = b"".join(
                struct.pack("<i", wave_sample(f, ch, pattern) << 8)[:3]
                for f in range(n_frames)
                for ch in range(channels)
            )
        elif bits == 8:
            data = bytes(
                (wave_sample(f, ch, pattern) >> 5) + 128
                for f in range(n_frames)
                for ch in range(channels)
            )
        else:
            raise ValueError("pattern waveform requires 8/16/24-bit samples")
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out)) + out
