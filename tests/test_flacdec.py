"""FLAC codec: encode→decode sample-exactness for the fixture's
fixed-predictor/Rice frames across all stereo decorrelations, equality
against the WAV path on the same waveform, hand-assembled spec vectors
for the paths the encoder never emits (LPC subframes, partition order
> 0, Rice escape partitions, wasted bits, 5-bit Rice method), and loud
rejection of corrupt streams (CRC-8/CRC-16 flips, truncation,
non-16-bit)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from parallel_map_reduce_spark.multimodal.audiohdr import build_wav, wave_sample
from parallel_map_reduce_spark.multimodal.codec import decode_audio
from parallel_map_reduce_spark.multimodal.flacdec import (
    _BitWriter,
    _utf8_number,
    build_flac,
    crc8,
    crc16,
    decode_flac_samples,
    parse_flac_streaminfo,
)


@pytest.mark.parametrize("mode", ["independent", "left-side", "mid-side"])
@pytest.mark.parametrize(
    ("sr", "ch", "nf", "base"),
    [(8000, 2, 25, 7), (22050, 2, 224, 200), (44100, 2, 500, 255)],
)
def test_roundtrip_matches_formula(mode, sr, ch, nf, base):
    payload = build_flac(sr, ch, nf, base, stereo_mode=mode)
    assert parse_flac_streaminfo(payload) == (sr, ch, 16, nf)
    dsr, dch, arr = decode_flac_samples(payload)
    exp = np.array(
        [[wave_sample(f, c, base) for c in range(ch)] for f in range(nf)],
        np.int16,
    )
    assert (dsr, dch) == (sr, ch) and (arr == exp).all()


def test_flac_equals_wav_decode():
    """The codec dispatch decodes a FLAC and a WAV of the SAME waveform
    to identical samples — lossless compression, proven by equality
    against the uncompressed container."""
    for ch, nf, base in [(1, 60, 3), (2, 300, 123)]:
        w = decode_audio(build_wav(16000, ch, nf, pattern=base))
        f = decode_audio(build_flac(16000, ch, nf, base, stereo_mode="mid-side" if ch == 2 else "independent"))
        assert w[0] == f[0] and w[1] == f[1]
        assert (w[2] == f[2]).all()


def test_compression_is_real():
    """The FLAC fixture payloads are genuinely smaller than their PCM
    twins — the point of shipping a compressed-codec path."""
    wav = build_wav(22050, 2, 224, pattern=50)
    flac = build_flac(22050, 2, 224, 50, stereo_mode="left-side")
    assert len(flac) < len(wav) * 0.5


# ---------------------------------------------------------------------------
# Hand-assembled spec vectors


def _hand_flac(n_frames: int, subframe_bits: bytes, sr=8000, bps=16) -> bytes:
    """Mono single-frame FLAC around pre-encoded subframe bits
    (frame header and CRCs assembled here, mirroring the spec)."""
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", n_frames, n_frames)
    si += b"\x00\x00\x00" * 2
    si.append((sr >> 12) & 0xFF)
    si.append((sr >> 4) & 0xFF)
    si.append(((sr & 0x0F) << 4) | (0 << 1) | ((bps - 1) >> 4))
    si.append((((bps - 1) & 0x0F) << 4) | 0)
    si += struct.pack(">I", n_frames)
    si += b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + si
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(6, 4)  # 8-bit blocksize-1 at header end
    w.write(0, 4)  # rate from STREAMINFO
    w.write(0, 4)  # 1 channel
    w.write({16: 4, 20: 5, 24: 6}[bps], 3)  # sample-size code
    w.write(0, 1)
    for b in _utf8_number(0):
        w.write(b, 8)
    w.write(n_frames - 1, 8)
    w.align()
    header = w.bytes()
    body = bytearray(header)
    body.append(crc8(header))
    body += subframe_bits
    out += body + struct.pack(">H", crc16(bytes(body)))
    return bytes(out)


def test_lpc_subframe_hand_vector():
    """An order-2 LPC subframe (precision 4, shift 2, coefficients
    [5, -2]) hand-packed with a 5-bit-Rice (method 1) residual: the
    decoder must reproduce the spec recursion
    s[i] = r[i] + ((5*s[i-1] - 2*s[i-2]) >> 2)."""
    warm = [100, 110]
    resid = [3, -4, 0, 7]
    w = _BitWriter()
    w.write(0, 1)  # padding
    w.write(32 + 1, 6)  # LPC order 2
    w.write(0, 1)  # no wasted bits
    for s in warm:
        w.write_signed(s, 16)
    w.write(4 - 1, 4)  # precision 4
    w.write_signed(2, 5)  # shift
    w.write_signed(5, 4)
    w.write_signed(-2, 4)
    w.write(1, 2)  # residual method 1: 5-bit params
    w.write(0, 4)  # partition order 0
    w.write(2, 5)  # rice param 2
    for r in resid:
        v = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(v >> 2)
        w.write(v & 3, 2)
    w.align()
    data = _hand_flac(6, w.bytes())
    _sr, _ch, arr = decode_flac_samples(data)
    exp = list(warm)
    for r in resid:
        exp.append(r + ((5 * exp[-1] - 2 * exp[-2]) >> 2))
    assert arr.ravel().tolist() == exp


def test_partitioned_and_escape_residual():
    """Partition order 1 with one Rice partition and one ESCAPE (raw
    5-bit) partition — the residual layouts the fixture encoder never
    writes."""
    n = 8  # blocksize; order-1 fixed predictor
    warm = [50]
    res1 = [1, -1, 2]  # partition 1: n/2 - order = 3 samples, rice param 1
    res2 = [-7, 6, -5, 4]  # partition 2: n/2 = 4 samples, escape raw 5-bit
    w = _BitWriter()
    w.write(0, 1)
    w.write(8 + 1, 6)  # FIXED order 1
    w.write(0, 1)
    w.write_signed(warm[0], 16)
    w.write(0, 2)  # method 0
    w.write(1, 4)  # partition order 1 -> 2 partitions of n/2
    w.write(1, 4)  # partition 1 rice param 1
    for r in res1:
        v = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(v >> 1)
        w.write(v & 1, 1)
    w.write(15, 4)  # partition 2: escape
    w.write(5, 5)  # raw 5-bit residuals
    for r in res2:
        w.write_signed(r, 5)
    w.align()
    data = _hand_flac(n, w.bytes())
    _sr, _ch, arr = decode_flac_samples(data)
    exp = list(warm)
    for r in res1 + res2:
        exp.append(r + exp[-1])
    assert arr.ravel().tolist() == exp


def test_wasted_bits_shift():
    """A CONSTANT subframe with 3 wasted bits: the coded value is
    sample >> 3 in 13 bits; decode must shift it back."""
    w = _BitWriter()
    w.write(0, 1)
    w.write(0, 6)  # CONSTANT
    w.write(1, 1)  # wasted-bits flag
    w.write_unary(2)  # unary 2 -> wasted = 3
    w.write_signed(-1000 >> 3, 13)
    w.align()
    data = _hand_flac(5, w.bytes())
    _sr, _ch, arr = decode_flac_samples(data)
    assert (arr.ravel() == (-1000 >> 3) << 3).all()


def test_crc_corruption_rejected():
    payload = bytearray(build_flac(8000, 1, 40, 9))
    # Flip a bit in the last byte (inside the audio frame payload).
    payload[-3] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac_samples(bytes(payload))


def test_truncation_and_garbage_rejected():
    payload = build_flac(8000, 2, 100, 9, stereo_mode="mid-side")
    with pytest.raises(ValueError):
        decode_flac_samples(payload[: len(payload) // 2])
    with pytest.raises(ValueError):
        decode_flac_samples(b"not flac at all")
    assert parse_flac_streaminfo(b"fLaC\x00\x00") is None


def test_above_24bit_rejected():
    """A STREAMINFO declaring 32-bit must raise loudly (decoder scope
    ends at 24), not mis-decode."""
    payload = bytearray(build_flac(8000, 1, 30, 1))
    # bits-per-sample-1 straddles STREAMINFO bytes 12/13: set to 31.
    payload[8 + 12] = (payload[8 + 12] & 0xFE) | (31 >> 4)
    payload[8 + 13] = ((31 & 0x0F) << 4) | (payload[8 + 13] & 0x0F)
    with pytest.raises(ValueError, match="above 24 bits"):
        decode_flac_samples(bytes(payload))


@pytest.mark.parametrize("bps", [20, 24])
@pytest.mark.parametrize("mode", ["independent", "left-side", "mid-side"])
def test_high_depth_roundtrip_matches_scaled_formula(bps, mode):
    """20/24-bit streams (r13): encode → decode reproduces the zigzag
    waveform left-shifted by bps-16, as int32, through every stereo
    decorrelation (the side channel is bps+1 wide — 25 bits at 24-bit
    depth)."""
    sr, ch, nf, base = 22050, 2, 250, 77
    payload = build_flac(sr, ch, nf, base, stereo_mode=mode, bps=bps)
    assert parse_flac_streaminfo(payload) == (sr, ch, bps, nf)
    dsr, dch, arr = decode_flac_samples(payload)
    assert (dsr, dch) == (sr, ch) and arr.dtype == np.int32
    exp = np.array(
        [
            [wave_sample(f, c, base) << (bps - 16) for c in range(ch)]
            for f in range(nf)
        ],
        np.int32,
    )
    assert (arr == exp).all()


def test_high_depth_hand_vector_lpc_24bit():
    """Hand-packed 24-bit LPC spec vector: order-1 LPC with coef 1,
    shift 0 (s[i] = s[i-1] + r[i]) over full-range 24-bit warmup —
    pins that subframe arithmetic carries 24-bit magnitudes exactly."""
    warm = [-(1 << 23), (1 << 23) - 1]
    w = _BitWriter()
    # subframe 1 (mono): LPC order 2 -> stype 32 + (2-1)... use order 2
    w.write(0, 1)
    w.write(33, 6)  # LPC order 2
    w.write(0, 1)  # no wasted bits
    for s in warm:
        w.write_signed(s, 24)
    w.write(14, 4)  # precision-1 = 14 -> 15-bit coefs
    w.write_signed(0, 5)  # shift 0
    w.write_signed(0, 15)  # c0 = 0
    w.write_signed(1, 15)  # c1 = 1 -> pred = s[i-2]
    res = [5, -5, 123]
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 4)  # rice param 0
    for r in res:
        v = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(v >> 0)
    w.align()
    data = _hand_flac(5, w.bytes(), bps=24)
    _sr, _ch, arr = decode_flac_samples(data)
    exp = list(warm)
    for r in res:
        exp.append(r + exp[-2])
    assert arr.dtype == np.int32 and arr.ravel().tolist() == exp


def test_fixture_flac_payloads_decode_to_formula():
    """Every committed FLAC payload sample-decodes to the waveform
    formula (full sweep over the mixed fixture's compressed quarter)."""
    import pyarrow.parquet as pq

    t = pq.read_table("/root/repo/refdata/audio_fixture.parquet")
    n_flac = 0
    depths: set[int] = set()
    for d, payload, codec, ch, nf, peak, ssq in zip(
        t["doc_id"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_codec"].to_pylist(),
        t["exp_channels"].to_pylist(),
        t["exp_n_frames"].to_pylist(),
        t["exp_peak"].to_pylist(),
        t["exp_sum_sq"].to_pylist(),
    ):
        if codec != "flac":
            continue
        n_flac += 1
        _sr, _c, arr = decode_flac_samples(payload)
        flat = arr.astype(np.int64).ravel()
        assert arr.shape == (nf, ch), d
        assert int(np.abs(flat).max()) == peak, d
        assert int(np.dot(flat, flat)) == ssq, d
        bps = parse_flac_streaminfo(payload)[2]
        assert arr.dtype == (np.int16 if bps == 16 else np.int32), d
        depths.add(bps)
    assert n_flac == 1250
    # the committed fixture exercises every supported FLAC depth
    assert depths == {16, 20, 24}


def test_unknown_total_samples_decodes_to_eof():
    """STREAMINFO total_samples == 0 means UNKNOWN (RFC 9639 streamed
    encodes): the decoder must decode frames until end-of-stream, not
    return an empty array (review r12)."""
    payload = bytearray(build_flac(8000, 2, 250, 42, stereo_mode="left-side"))
    # Zero the 36-bit total_samples field (STREAMINFO bytes 13 low
    # nibble + bytes 14..17), fixing nothing else.
    payload[8 + 13] &= 0xF0
    payload[8 + 14 : 8 + 18] = b"\x00" * 4
    sr, ch, arr = decode_flac_samples(bytes(payload))
    exp = np.array(
        [[wave_sample(f, c, 42) for c in range(2)] for f in range(250)],
        np.int16,
    )
    assert (sr, ch) == (8000, 2) and (arr == exp).all()


def test_wasted_bits_exhausting_sample_width_rejected():
    """A corrupt wasted-bits run that leaves no effective sample bits
    must reject with a deliberate message, not an incidental negative-
    shift error inside read_signed (advisor r12)."""
    w = _BitWriter()
    w.write(0, 1)
    w.write(0, 6)  # CONSTANT
    w.write(1, 1)  # wasted-bits flag
    w.write_unary(15)  # wasted = 16 -> eff = 0 at bps 16
    w.align()
    data = _hand_flac(5, w.bytes())
    with pytest.raises(ValueError, match="wasted-bits"):
        decode_flac_samples(data)
