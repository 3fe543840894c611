"""JPEG codec: encode→decode exactness for DC-only pattern files (the
fixture's construction), hand-assembled general scans with AC
coefficients / ZRL / runs decoded against the textbook double-sum IDCT
(independent of the decoder's matrix IDCT), restart-marker handling,
PROGRESSIVE (SOF2) spec vectors — spectral selection, successive
approximation with AC refinement, cross-block EOBRUN — and rejection
of the variants the decoder honestly does not support (arithmetic
coding, lossless, hierarchical).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from parallel_map_reduce_spark.multimodal.imagehdr import (
    _JpegBitWriter,
    build_jpeg,
    jpeg_block_value,
    parse_image_header,
)
from parallel_map_reduce_spark.multimodal.jpegdec import (
    ZIGZAG,
    decode_jpeg_pixels,
    idct_2d,
)


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize(("w", "h", "base"), [(8, 8, 0), (13, 7, 42), (55, 43, 255), (1, 1, 9)])
def test_dc_only_roundtrip_exact(channels, w, h, base):
    """The fixture construction: DC-only blocks with dc*q divisible by
    8 decode to EXACT flat integers predictable from block arithmetic
    (no IDCT in the expectation)."""
    data = build_jpeg(w, h, channels, pattern=base)
    assert parse_image_header(data) == ("jpeg", w, h, channels)
    dw, dh, dc, px = decode_jpeg_pixels(data)
    assert (dw, dh, dc) == (w, h, channels)
    got = np.frombuffer(px, np.uint8).reshape(h, w, channels)
    for y in range(h):
        for x in range(w):
            assert (got[y, x] == jpeg_block_value(x // 8, y // 8, base)).all()


def _assemble_jpeg(w, h, dqt_vals, scan_bits, dri=None):
    """Hand-assemble a 1-component baseline JPEG around ``scan_bits``
    with richer Huffman tables than the fixture encoder's: DC symbols
    0..11 at length 4; AC symbols [EOB, 0x01, 0x11, 0xF0, 0x02] at
    length 3 (canonical codes 000..100)."""
    out = bytearray(b"\xff\xd8")
    dqt = b"\x00" + bytes(dqt_vals)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dc_counts = [0, 0, 0, 12] + [0] * 12
    ac_counts = [0, 0, 5] + [0] * 13
    dht = b"\x00" + bytes(dc_counts) + bytes(range(12))
    dht += b"\x10" + bytes(ac_counts) + bytes([0x00, 0x01, 0x11, 0xF0, 0x02])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if dri is not None:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan_bits
    out += b"\xff\xd9"
    return bytes(out)


# Canonical codes for the tables above.
_DC = {s: (4, s) for s in range(12)}  # 12 symbols at length 4: codes 0..11
_AC = {0x00: (3, 0), 0x01: (3, 1), 0x11: (3, 2), 0xF0: (3, 3), 0x02: (3, 4)}


def test_general_ac_scan_matches_double_sum_idct():
    """A hand-packed scan with DC + AC coefficients, a run skip, and a
    ZRL decodes to the same pixels as the TEXTBOOK double-sum IDCT of
    the same coefficient block — checking the decoder's entropy walk
    and matrix IDCT against the spec formula, not against our encoder
    (which never emits AC)."""
    q = 16
    w = _JpegBitWriter()
    # DC: category 3, bits '101' = 5  -> dc = 5
    ln, code = _DC[3]
    w.write(code, ln)
    w.write(5, 3)
    # AC z=1: symbol 0x01 (run 0, size 1), bit '1' -> +1
    ln, code = _AC[0x01]
    w.write(code, ln)
    w.write(1, 1)
    # AC: symbol 0x11 (run 1, size 1), bit '0' -> skip z=2, coeff(z=3) = -1
    ln, code = _AC[0x11]
    w.write(code, ln)
    w.write(0, 1)
    # ZRL: 16 zeros (z 4..19)
    ln, code = _AC[0xF0]
    w.write(code, ln)
    # AC z=20: symbol 0x02 (run 0, size 2), bits '10' = 2 -> +2
    ln, code = _AC[0x02]
    w.write(code, ln)
    w.write(2, 2)
    # EOB
    ln, code = _AC[0x00]
    w.write(code, ln)
    data = _assemble_jpeg(8, 8, [q] * 64, w.flush())

    dw, dh, dc, px = decode_jpeg_pixels(data)
    assert (dw, dh, dc) == (8, 8, 1)

    coeffs = np.zeros((8, 8), np.float64)
    for z, v in ((0, 5), (1, 1), (3, -1), (20, 2)):
        r, c = ZIGZAG[z]
        coeffs[r, c] = v * q
    # Textbook double sum (JPEG spec / DCT-III definition).
    ref = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (
                        cu * cv * coeffs[u, v]
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                    )
            ref[y, x] = s / 4
    assert np.allclose(idct_2d(coeffs), ref, atol=1e-9)
    exp = np.clip(np.rint(ref + 128), 0, 255).astype(np.uint8)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(8, 8), exp)


def test_restart_markers_reset_dc_predictors():
    """DRI=1 with RSTn between MCUs: predictors reset, so two blocks
    each coding dc=+3 decode to the same value (not 3 then 6)."""
    q = 16

    def block_bits(writer):
        ln, code = _DC[2]
        writer.write(code, ln)
        writer.write(3, 2)  # dc diff +3
        ln, code = _AC[0x00]
        writer.write(code, ln)

    w1 = _JpegBitWriter()
    block_bits(w1)
    w2 = _JpegBitWriter()
    block_bits(w2)
    scan = w1.flush() + b"\xff\xd0" + w2.flush()
    data = _assemble_jpeg(16, 8, [q] * 64, scan, dri=1)
    dw, dh, dc, px = decode_jpeg_pixels(data)
    img = np.frombuffer(px, np.uint8).reshape(8, 16)
    assert (img[:, :8] == img[0, 0]).all()
    assert np.array_equal(img[:, 8:], img[:, :8])  # predictor was reset


def test_unsupported_variants_rejected():
    base = build_jpeg(16, 16, 3, pattern=1)
    # Flipping a BASELINE stream's SOF0 to SOF2 leaves a full-band
    # (Ss=0, Se=63) multi-component scan, which is invalid progressive
    # syntax (a DC scan must have Se=0) — loud rejection, not a
    # mis-decode. Real progressive streams decode (tests below).
    mutated = bytearray(base)
    i = mutated.index(b"\xff\xc0")
    mutated[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(mutated))

    oversampled = bytearray(base)
    j = oversampled.index(b"\xff\xc0")
    # First component's sampling byte: len(2)+prec(1)+h(2)+w(2)+nc(1)+cid(1).
    # Factor 3 is beyond the supported 1-2 range (0x22 = 4:2:0 IS
    # supported since the MCU-walk generalization).
    oversampled[j + 2 + 2 + 1 + 4 + 1 + 1 + 1] = 0x33
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(oversampled))

    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xd9")  # no scan


@pytest.mark.parametrize(("w", "h", "base"), [(16, 16, 0), (13, 7, 42), (55, 43, 200), (17, 23, 255)])
def test_420_subsampled_roundtrip_exact(w, h, base):
    """4:2:0 DC-only files decode to the SAME block-arithmetic pixels
    as 4:4:4 (luma blocks keyed by global coords; chroma flat), edge
    crops included — the interleaved-MCU walk and chroma upsample must
    not shift anything."""
    data = build_jpeg(w, h, 3, pattern=base, subsampling="420")
    dw, dh, dc, px = decode_jpeg_pixels(data)
    assert (dw, dh, dc) == (w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    for y in range(0, h, 3):
        for x in range(0, w, 3):
            assert (got[y, x] == jpeg_block_value(x // 8, y // 8, base)).all()


def test_420_chroma_upsample_indexing():
    """Two horizontally adjacent 4:2:0 MCUs with DIFFERENT Cb values:
    the left 16 pixel columns must carry MCU0's chroma and the right
    16 MCU1's — catching any upsample/index shift that flat-chroma
    tests cannot see. Stream hand-packed with the encoder's tables."""
    from parallel_map_reduce_spark.multimodal.imagehdr import (
        _JPEG_AC_COUNTS,
        _JPEG_DC_COUNTS,
        _jpeg_canonical_codes,
    )

    w, h = 32, 16
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = b"\x00" + bytes(_JPEG_DC_COUNTS) + bytes(range(12))
    dht += b"\x10" + bytes(_JPEG_AC_COUNTS) + bytes([0x00])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_COUNTS)
    (eob_len, eob_code) = _jpeg_canonical_codes(_JPEG_AC_COUNTS)[0]
    wtr = _JpegBitWriter()

    def block(dc_diff):
        s = dc_diff.bit_length() if dc_diff else 0
        ln, code = dc_codes[s]
        wtr.write(code, ln)
        if s:
            wtr.write(dc_diff if dc_diff > 0 else dc_diff + (1 << s) - 1, s)
        wtr.write(eob_code, eob_len)

    # MCU0: 4 Y blocks dc=0, Cb dc=+8 (value 144), Cr dc=0
    for _ in range(4):
        block(0)
    block(8)
    block(0)
    # MCU1: 4 Y blocks, Cb dc diff=-16 (value 112), Cr diff=0
    for _ in range(4):
        block(0)
    block(-16)
    block(0)
    out += wtr.flush() + b"\xff\xd9"

    dw, dh, dc, px = decode_jpeg_pixels(bytes(out))
    assert (dw, dh, dc) == (w, h, 3)
    img = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(float)

    def jfif_rgb(yv, cb, cr):
        r = yv + 1.402 * (cr - 128.0)
        g = yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = yv + 1.772 * (cb - 128.0)
        return [min(255, max(0, round(c))) for c in (r, g, b)]

    left = jfif_rgb(128.0, 144.0, 128.0)
    right = jfif_rgb(128.0, 112.0, 128.0)
    assert img[:, :16].reshape(-1, 3).tolist() == [left] * (16 * 16)
    assert img[:, 16:].reshape(-1, 3).tolist() == [right] * (16 * 16)


def test_color_conversion_identity_for_flat_chroma():
    """3-component pattern files carry flat-128 chroma: decoded RGB
    must equal the Y plane exactly (JFIF conversion with zero chroma
    offsets), which is what makes color JPEG rows oracle-exact."""
    data = build_jpeg(24, 16, 3, pattern=77)
    _, _, _, px = decode_jpeg_pixels(data)
    img = np.frombuffer(px, np.uint8).reshape(16, 24, 3)
    assert (img[:, :, 0] == img[:, :, 1]).all()
    assert (img[:, :, 1] == img[:, :, 2]).all()


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding


def _assemble_progressive(w, h, dqt_vals, scans):
    """Hand-assemble a 1-component PROGRESSIVE JPEG: same rich hand
    tables as _assemble_jpeg (plus AC symbols 0x21/0x31 for refinement
    runs), one SOS per (ss, se, ah, al, bits) in ``scans``."""
    out = bytearray(b"\xff\xd8")
    dqt = b"\x00" + bytes(dqt_vals)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dc_counts = [0, 0, 0, 12] + [0] * 12
    ac_counts = [0, 1, 3, 6] + [0] * 12  # Kraft-complete: 2^-2 + 3*2^-3 + 6*2^-4 = 1
    dht = b"\x00" + bytes(dc_counts) + bytes(range(12))
    dht += b"\x10" + bytes(ac_counts) + bytes(
        [0x00, 0x01, 0x11, 0xF0, 0x02, 0x21, 0x31, 0xE2, 0x10, 0x61]
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    for ss, se, ah, al, bits in scans:
        sos = bytes([1, 1, 0x00]) + bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += bits
    out += b"\xff\xd9"
    return bytes(out)


# Canonical codes for the progressive hand tables: EOB at length 2
# (code 0), 3 symbols at length 3 (codes 2-4), 6 at length 4 (10-15).
_PDC = {s: (4, s) for s in range(12)}
_PAC = {
    0x00: (2, 0), 0x01: (3, 2), 0x11: (3, 3), 0xF0: (3, 4),
    0x02: (4, 10), 0x21: (4, 11), 0x31: (4, 12), 0xE2: (4, 13),
    0x10: (4, 14), 0x61: (4, 15),
}


def _textbook_pixels(coeff_by_zigzag: dict[int, int], q: int) -> np.ndarray:
    coeffs = np.zeros((8, 8), np.float64)
    for z, v in coeff_by_zigzag.items():
        r, c = ZIGZAG[z]
        coeffs[r, c] = v * q
    return np.clip(np.rint(idct_2d(coeffs) + 128), 0, 255).astype(np.uint8)


def test_progressive_spectral_selection_matches_idct():
    """Spectral selection without successive approximation: the same
    coefficient block split across a DC scan and two AC band scans
    (1-5, 6-63 with a ZRL) decodes to the textbook-IDCT pixels."""
    q = 16
    # DC scan: dc = 5 (category 3, bits '101').
    w1 = _JpegBitWriter()
    ln, code = _PDC[3]
    w1.write(code, ln)
    w1.write(5, 3)
    # AC band 1..5: z1 = +1, skip z2, z3 = -1, EOB (covers z4..5).
    w2 = _JpegBitWriter()
    for sym, extra in ((0x01, (1, 1)), (0x11, (0, 1)), (0x00, None)):
        ln, code = _PAC[sym]
        w2.write(code, ln)
        if extra:
            w2.write(*extra)
    # AC band 6..63: ZRL (z6..21), z22 = +2 (size 2, bits '10'), EOB.
    w3 = _JpegBitWriter()
    for sym, extra in ((0xF0, None), (0x02, (2, 2)), (0x00, None)):
        ln, code = _PAC[sym]
        w3.write(code, ln)
        if extra:
            w3.write(*extra)
    data = _assemble_progressive(
        8, 8, [q] * 64,
        [(0, 0, 0, 0, w1.flush()), (1, 5, 0, 0, w2.flush()), (6, 63, 0, 0, w3.flush())],
    )
    dw, dh, dc, px = decode_jpeg_pixels(data)
    assert (dw, dh, dc) == (8, 8, 1)
    exp = _textbook_pixels({0: 5, 1: 1, 3: -1, 22: 2}, q)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(8, 8), exp)


def test_progressive_successive_approximation_ac_refinement():
    """Full successive approximation on one block: DC split across a
    first pass (Al=1) + refinement bit, AC band coded coarse at Al=1
    then refined at Al=0 — newly-visible ±1 coefficients, interleaved
    correction bits, EOB runs. Target coefficients: dc=5, z1=+3,
    z2=-2, z5=+1."""
    q = 16
    # Scan 1 — DC first at Al=1: codes 5>>1 = 2 (category 2, bits '10').
    w1 = _JpegBitWriter()
    ln, code = _PDC[2]
    w1.write(code, ln)
    w1.write(2, 2)
    # Scan 2 — DC refinement to Al=0: one raw bit = 5 & 1 = 1.
    w2 = _JpegBitWriter()
    w2.write(1, 1)
    # Scan 3 — AC 1..63 first at Al=1: z1 -> 3>>1=+1, z2 -> -2/2=-1
    # (run 0 size 1, sign bits 1 then 0), z5 invisible at this
    # precision, EOB.
    w3 = _JpegBitWriter()
    for sym, extra in ((0x01, (1, 1)), (0x01, (0, 1)), (0x00, None)):
        ln, code = _PAC[sym]
        w3.write(code, ln)
        if extra:
            w3.write(*extra)
    # Scan 4 — AC 1..63 refinement Ah=1,Al=0 (libjpeg bit order:
    # symbol, sign, then buffered correction bits):
    #   z5 newly nonzero after runs over z3,z4 (zero history) -> symbol
    #   0x21 (r=2, s=1), sign '1', then correction bits for the
    #   nonzero-history coefficients passed on the way: z1 (|3| bit0 =
    #   1), z2 (|-2| bit0 = 0). Then EOB (no further nonzero history).
    w4 = _JpegBitWriter()
    ln, code = _PAC[0x21]
    w4.write(code, ln)
    w4.write(1, 1)  # sign: +1
    w4.write(1, 1)  # correction for z1: 2 -> 3
    w4.write(0, 1)  # correction for z2: -2 stays
    ln, code = _PAC[0x00]
    w4.write(code, ln)
    data = _assemble_progressive(
        8, 8, [q] * 64,
        [
            (0, 0, 0, 1, w1.flush()),
            (0, 0, 1, 0, w2.flush()),
            (1, 63, 0, 1, w3.flush()),
            (1, 63, 1, 0, w4.flush()),
        ],
    )
    dw, dh, dc, px = decode_jpeg_pixels(data)
    assert (dw, dh, dc) == (8, 8, 1)
    exp = _textbook_pixels({0: 5, 1: 3, 2: -2, 5: 1}, q)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(8, 8), exp)


def test_progressive_eobrun_spans_blocks():
    """A single EOBn symbol must end the band for a RUN of blocks: in a
    2-block image the AC scan is one 0x10 symbol (r=1 -> EOBRUN base 2,
    no extension bits), covering both blocks' 1..63 bands — the decoder
    must consume no further AC symbols and keep both DC-only values."""
    w1 = _JpegBitWriter()
    ln, code = _PDC[3]
    w1.write(code, ln)
    w1.write(5, 3)  # dc block 0 = 5
    ln, code = _PDC[2]
    w1.write(code, ln)
    w1.write(1, 2)  # diff -2 -> dc block 1 = 3
    w2 = _JpegBitWriter()
    ln, code = _PAC[0x10]  # EOBRUN = 1 << 1 = 2 blocks
    w2.write(code, ln)
    data = _assemble_progressive(
        16, 8, [16] * 64, [(0, 0, 0, 0, w1.flush()), (1, 63, 0, 0, w2.flush())]
    )
    dw, dh, dc, px = decode_jpeg_pixels(data)
    img = np.frombuffer(px, np.uint8).reshape(8, 16)
    assert (img[:, :8] == 128 + 2 * 5).all()
    assert (img[:, 8:] == 128 + 2 * 3).all()


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize(("w", "h", "base"), [(8, 8, 0), (13, 7, 42), (55, 43, 255)])
def test_progressive_builder_equals_baseline(channels, sub, w, h, base):
    """build_jpeg(progressive=True) — DC first (Al=1) + DC refinement +
    per-component all-EOB AC scans — decodes to EXACTLY the baseline
    form's pixels for every geometry/subsampling the fixture uses."""
    if sub == "420" and channels == 1:
        pytest.skip("420 requires 3 components")
    b0 = build_jpeg(w, h, channels, pattern=base, subsampling=sub)
    bp = build_jpeg(w, h, channels, pattern=base, subsampling=sub, progressive=True)
    assert decode_jpeg_pixels(bp) == decode_jpeg_pixels(b0)


def test_arithmetic_and_lossless_still_rejected():
    """Progressive is now decoded; arithmetic-coded (SOF10) and
    lossless (SOF3) remain loud rejections."""
    base = build_jpeg(16, 16, 3, pattern=1)
    for sof in (0xCA, 0xC3, 0xC9):
        mutated = bytearray(base)
        i = mutated.index(b"\xff\xc0")
        mutated[i + 1] = sof
        with pytest.raises(ValueError):
            decode_jpeg_pixels(bytes(mutated))


def test_progressive_huge_dims_raise_valueerror_not_memoryerror():
    """Review r12: the progressive path must reject crafted huge
    dimensions via the DC-scan length floor BEFORE allocating the
    coefficient store (the SOF0 guard's counterpart)."""
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    dht_dc = seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    sof = seg(0xC2, b"\x08" + struct.pack(">HH", 65500, 65500) + b"\x01" + b"\x01\x22\x00")
    sos = seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x00\x01")  # DC first, Al=1
    data = b"\xff\xd8" + dqt + dht_dc + sof + sos + b"\x00" * 64 + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg_pixels(data)


def test_progressive_ac_scan_before_dc_rejected():
    """An AC scan for a component with no prior DC scan is invalid
    progressive syntax (T.81 G.1.1.1.1) and must raise, not allocate."""
    w1 = _JpegBitWriter()
    ln, code = _PAC[0x00]
    w1.write(code, ln)
    data = _assemble_progressive(8, 8, [16] * 64, [(1, 63, 0, 0, w1.flush())])
    with pytest.raises(ValueError):
        decode_jpeg_pixels(data)


def test_progressive_dc_refinement_before_dc_first_rejected():
    """A DC refinement scan (Ss=0, Ah>0) with no preceding DC first
    scan is invalid progressive syntax; it must raise rather than
    allocate a zeroed store and silently refine it (advisor r12 — the
    AC-scan guard's DC counterpart)."""
    data = _assemble_progressive(8, 8, [16] * 64, [(0, 0, 1, 0, b"\x80")])
    with pytest.raises(ValueError, match="before its DC first scan"):
        decode_jpeg_pixels(data)
