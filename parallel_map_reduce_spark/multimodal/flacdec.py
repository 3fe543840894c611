"""Stdlib FLAC codec: a real lossless-audio decoder (and a fixture
encoder) — pure ``struct``/numpy, no libFLAC.

FLAC is the natural compressed-audio counterpart to the repo's MJPEG
and progressive-JPEG work: the format is fully integer (LPC/fixed
prediction + Rice-coded residuals), so a correct decode is SAMPLE-EXACT
and the fixture-oracle independence contract carries over unchanged —
expected loudness statistics derive from the waveform FORMULA, never
from running this decoder. Public basis: the FLAC format specification
(xiph.org / RFC 9639); the reference repo has no audio path (north-star
scope).

Decoder scope (honest): 4- to 24-bit sample sizes (8/12/16 decode to
int16, 20/24 to int32 — r13, closing the r12 "non-16-bit raises"
headroom item; 25-32-bit raises loudly), any channel count 1-8, fixed
and variable blocking, all subframe types (CONSTANT / VERBATIM /
FIXED order 0-4 / LPC order 1-32), both residual methods (4- and
5-bit Rice parameters, escape partitions, partition order 0-15),
wasted bits, and all stereo decorrelations (independent, left/side,
right/side, mid/side). Frame-header CRC-8 and frame CRC-16 are
verified — a corrupt stream raises ValueError rather than mis-decoding.

Encoder scope (fixture): 16/20/24-bit mono/stereo, frames of 192
samples plus a partial tail frame, per-channel CONSTANT or FIXED
order-2 subframes with single-partition Rice residuals, and
per-document stereo decorrelation (independent / left-side /
mid-side) — real compression exercising the decoder's reconstruction
paths, with every choice deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# Fixed-predictor coefficients by order (predict s[i] from prior samples).
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}

_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the
    FLAC frame-header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 —
    the FLAC whole-frame checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes, with byte-position tracking so
    frame CRC-16 can cover exactly the consumed span."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC stream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC unary run too long (corrupt)")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(bits: _Bits) -> int:
    """The frame header's UTF-8-style coded frame/sample number
    (extended to 36 bits per the FLAC spec)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("invalid FLAC UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n_follow):
        nb = bits.read(8)
        if nb & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (nb & 0x3F)
    return v


def parse_flac_streaminfo(data: bytes):
    """(sample_rate, channels, bits_per_sample, total_samples) from the
    mandatory STREAMINFO block, or ``None`` if ``data`` is not FLAC."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return None
    data = bytes(data)
    if len(data) < 42 or data[:4] != FLAC_MAGIC:
        return None
    # First metadata block must be STREAMINFO (type 0), 34 bytes.
    btype = data[4] & 0x7F
    (length,) = struct.unpack(">I", b"\x00" + data[5:8])
    if btype != 0 or length != 34:
        return None
    body = data[8:42]
    sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
    channels = ((body[12] >> 1) & 0x07) + 1
    bps = (((body[12] & 0x01) << 4) | (body[13] >> 4)) + 1
    total = ((body[13] & 0x0F) << 32) | struct.unpack(">I", body[14:18])[0]
    if sr == 0:
        return None
    return sr, channels, bps, total


def _skip_metadata(data: bytes) -> int:
    """Byte offset of the first audio frame (past all metadata blocks)."""
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        last = data[pos] & 0x80
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        pos += 4 + length
        if last:
            return pos


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual section (both methods, escape partitions)."""
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    n_partitions = 1 << porder
    if blocksize % n_partitions:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    psize = blocksize >> porder
    if psize <= order and n_partitions == 1:
        raise ValueError("FLAC predictor order exceeds first partition")
    for p in range(n_partitions):
        count = psize - order if p == 0 else psize
        if count < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.read_unary()
                v = (q << param) | bits.read(param)
                out.append(-(v >> 1) - 1 if v & 1 else v >> 1)
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits flag: unary count - 1
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if eff < 1:
        # A corrupt wasted-bits unary run would otherwise surface as an
        # incidental negative-shift error inside read_signed (advisor
        # r12); reject the stream deliberately.
        raise ValueError(
            f"FLAC wasted-bits count {wasted} leaves no sample bits "
            f"(bits-per-sample {bps})"
        )
    if stype == 0:  # CONSTANT
        samples = [bits.read_signed(eff)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        samples = [bits.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        samples = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_samples(data: bytes):
    """REAL sample decode for a 4- to 24-bit FLAC stream: (sample_rate,
    channels, numpy array of shape (n_frames, channels)) — int16 for
    sample sizes <= 16, int32 for 20/24-bit. Raises ValueError for
    non-FLAC / >24-bit / corrupt payloads (both frame CRCs verified)."""
    info = parse_flac_streaminfo(bytes(data))
    if info is None:
        raise ValueError("not a parseable FLAC stream")
    sample_rate, channels, bps, total = info
    if bps > 24:
        raise ValueError(f"FLAC sample sizes above 24 bits unsupported (got {bps})")
    if bps < 4:
        raise ValueError(f"invalid FLAC bits-per-sample {bps}")
    data = bytes(data)
    pos = _skip_metadata(data)
    decoded: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    # STREAMINFO total_samples == 0 means UNKNOWN (RFC 9639) — a valid
    # streamed encode; decode frames until end-of-stream instead of
    # returning zero samples.
    unknown_total = total == 0
    while (pos < len(data)) if unknown_total else (got < total):
        if pos >= len(data):
            raise ValueError("FLAC stream ends before declared total samples")
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        if bits.read(1):
            raise ValueError("reserved FLAC frame bit set")
        bits.read(1)  # blocking strategy (number semantics only)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved FLAC frame bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code")
        elif sr_code and _SAMPLE_RATE_CODES[sr_code] != sample_rate:
            raise ValueError("FLAC frame sample rate disagrees with STREAMINFO")
        if ss_code == 0:
            frame_bps = bps
        else:
            frame_bps = _SAMPLE_SIZE_CODES.get(ss_code)
            if frame_bps is None:
                raise ValueError("reserved FLAC sample-size code")
        if frame_bps != bps:
            raise ValueError("FLAC frame sample size disagrees with STREAMINFO")
        if bits.bit:
            raise ValueError("FLAC frame header not byte-aligned")
        header_bytes = data[frame_start : bits.byte]
        if crc8(header_bytes) != bits.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        # Channel assignment: 0-7 independent; 8 L/S, 9 R/S, 10 M/S.
        if ch_code < 8:
            if ch_code + 1 != channels:
                raise ValueError("FLAC frame channel count disagrees with STREAMINFO")
            chans = [
                _decode_subframe(bits, blocksize, bps) for _ in range(channels)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in a non-stereo stream")
            # The SIDE channel carries one extra bit of range.
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, blocksize, bps)
                side = _decode_subframe(bits, blocksize, bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side (side first)
                side = _decode_subframe(bits, blocksize, bps + 1)
                right = _decode_subframe(bits, blocksize, bps)
                chans = [[s + r for s, r in zip(side, right)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, blocksize, bps)
                side = _decode_subframe(bits, blocksize, bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError("reserved FLAC channel assignment")
        bits.align()
        body = data[frame_start : bits.byte]
        footer = data[bits.byte : bits.byte + 2]
        if len(footer) < 2:
            raise ValueError("FLAC frame footer truncated")
        if crc16(body) != struct.unpack(">H", footer)[0]:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.byte + 2
        for c in range(channels):
            decoded[c].extend(chans[c])
        got += blocksize
    if not unknown_total and got != total:
        raise ValueError("FLAC sample count disagrees with STREAMINFO")
    arr = np.array(decoded, dtype=np.int64).T
    lim = 1 << (bps - 1)
    if arr.size and (arr.max() > lim - 1 or arr.min() < -lim):
        raise ValueError(f"FLAC decoded samples out of {bps}-bit range")
    return sample_rate, channels, arr.astype(np.int16 if bps <= 16 else np.int32)


# ---------------------------------------------------------------------------
# Encoder (fixture generation + decoder tests)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, value: int, length: int) -> None:
        self.write(value & ((1 << length) - 1), length)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _utf8_number(v: int) -> bytes:
    """UTF-8-style coding of the frame number (the decoder's
    _read_utf8_number inverse). Payload capacity with n continuation
    bytes is 6 + 5n bits (lead byte carries 6-n bits)."""
    if v < 0x80:
        return bytes([v])
    n_follow = 1
    while v >= (1 << (6 + 5 * n_follow)):
        n_follow += 1
        if n_follow > 6:
            raise ValueError("frame number too large")
    lead = (0xFF ^ (0xFF >> (n_follow + 1))) | (v >> (6 * n_follow))
    body = [0x80 | ((v >> (6 * i)) & 0x3F) for i in range(n_follow - 1, -1, -1)]
    return bytes([lead, *body])


def _best_rice_param(resid: list[int], plen: int) -> int:
    best, best_bits = 0, None
    for param in range(min(15, (1 << plen) - 1)):
        total = 0
        for r in resid:
            v = 2 * r if r >= 0 else -2 * r - 1
            total += (v >> param) + 1 + param
            if best_bits is not None and total >= best_bits:
                break
        if best_bits is None or total < best_bits:
            best, best_bits = param, total
    return best


def _write_rice_residual(w: _BitWriter, resid: list[int]) -> None:
    """Single-partition method-0 Rice residual."""
    w.write(0, 2)  # method 0: 4-bit params
    w.write(0, 4)  # partition order 0
    param = _best_rice_param(resid, 4)
    w.write(param, 4)
    for r in resid:
        v = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(v >> param)
        w.write(v & ((1 << param) - 1), param)


def _write_subframe(w: _BitWriter, samples: list[int], bps: int) -> None:
    """CONSTANT when flat, else FIXED order-2 with Rice residuals."""
    w.write(0, 1)  # padding
    if all(s == samples[0] for s in samples):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write_signed(samples[0], bps)
        return
    if len(samples) < 3:
        w.write(1, 6)  # VERBATIM (too short for order 2)
        w.write(0, 1)
        for s in samples:
            w.write_signed(s, bps)
        return
    order = 2
    w.write(8 + order, 6)  # FIXED order 2
    w.write(0, 1)  # no wasted bits
    for s in samples[:order]:
        w.write_signed(s, bps)
    resid = [
        samples[i] - (2 * samples[i - 1] - samples[i - 2])
        for i in range(order, len(samples))
    ]
    _write_rice_residual(w, resid)


ENC_BLOCKSIZE = 192  # blocksize code 1


def build_flac(
    sample_rate: int,
    channels: int,
    n_frames: int,
    pattern: int,
    stereo_mode: str = "independent",
    bps: int = 16,
) -> bytes:
    """Fully valid 16/20/24-bit FLAC stream carrying the ``wave_sample``
    zigzag waveform (audiohdr.py; left-shifted by ``bps - 16`` for the
    wider depths, so formula-derived loudness scales by exact powers of
    two): STREAMINFO + frames of 192 samples (plus a partial tail
    frame), per-channel CONSTANT/FIXED-order-2 subframes with Rice
    residuals. ``stereo_mode`` for channels=2: 'independent',
    'left-side', or 'mid-side' — all lossless, so the decoded samples
    equal the formula regardless."""
    from .audiohdr import wave_sample

    if channels not in (1, 2):
        raise ValueError("encoder supports 1 or 2 channels")
    if bps not in (16, 20, 24):
        raise ValueError("encoder supports 16/20/24-bit sample sizes")
    if channels == 1:
        stereo_mode = "independent"
    if stereo_mode not in ("independent", "left-side", "mid-side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    shift = bps - 16
    chan_samples = [
        [wave_sample(f, c, pattern) << shift for f in range(n_frames)]
        for c in range(channels)
    ]
    out = bytearray(FLAC_MAGIC)
    # STREAMINFO (last-metadata flag set, type 0, 34 bytes).
    si = bytearray()
    bs = ENC_BLOCKSIZE if n_frames >= ENC_BLOCKSIZE else n_frames
    si += struct.pack(">HH", bs, bs)
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    si.append((sample_rate >> 12) & 0xFF)
    si.append((sample_rate >> 4) & 0xFF)
    si.append(((sample_rate & 0x0F) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4))
    si.append((((bps - 1) & 0x0F) << 4) | ((n_frames >> 32) & 0x0F))
    si += struct.pack(">I", n_frames & 0xFFFFFFFF)
    si += b"\x00" * 16  # MD5 unknown
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + si
    frame_no = 0
    done = 0
    while done < n_frames:
        blocksize = min(ENC_BLOCKSIZE, n_frames - done)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize stream: frame number coded
        bs_code = 1 if blocksize == ENC_BLOCKSIZE else 6
        w.write(bs_code, 4)
        w.write(0, 4)  # sample rate: from STREAMINFO
        if channels == 2 and stereo_mode == "left-side":
            w.write(8, 4)
        elif channels == 2 and stereo_mode == "mid-side":
            w.write(10, 4)
        else:
            w.write(channels - 1, 4)
        w.write({16: 4, 20: 5, 24: 6}[bps], 3)  # sample-size code
        w.write(0, 1)  # reserved
        for b in _utf8_number(frame_no):
            w.write(b, 8)
        if bs_code == 6:
            w.write(blocksize - 1, 8)
        w.align()
        header = w.bytes()
        w2 = _BitWriter()
        for b in header:
            w2.write(b, 8)
        w2.write(crc8(header), 8)
        block = [ch[done : done + blocksize] for ch in chan_samples]
        if channels == 2 and stereo_mode == "left-side":
            subs = [
                (block[0], bps),
                ([l - r for l, r in zip(block[0], block[1])], bps + 1),
            ]
        elif channels == 2 and stereo_mode == "mid-side":
            subs = [
                ([(l + r) >> 1 for l, r in zip(block[0], block[1])], bps),
                ([l - r for l, r in zip(block[0], block[1])], bps + 1),
            ]
        else:
            subs = [(ch, bps) for ch in block]
        for samples, sub_bps in subs:
            _write_subframe(w2, samples, sub_bps)
        w2.align()
        body = w2.bytes()
        out += body + struct.pack(">H", crc16(body))
        done += blocksize
        frame_no += 1
    return bytes(out)
