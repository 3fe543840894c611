"""Stdlib image-header codec: parse width/height/channels from magic
bytes (PNG / GIF / BMP / JPEG), plus deterministic builders used to
generate the committed binary fixture.

This replaces the length-derived fake dimensions of earlier rounds for
``multimodal_image_features`` (VERDICT r10 task 5): the decode is REAL
header parsing — ~believable production shape for a training-data
pipeline's metadata pass, where full pixel decode (PIL/libjpeg, absent
from this container) is only needed downstream of the metadata filter.
Pure stdlib ``struct``/``zlib``; no third-party codecs.

Parser contract: ``parse_image_header(data)`` returns
``(fmt, width, height, channels)`` or ``None`` when the payload is not
a recognized image — callers choose their own fallback. Channels are
the PIXEL-semANTIC count (palette formats report 3: a GIF/palette-PNG
index dereferences to RGB).

Builders produce small REAL files: the PNG is fully decodable (zlib
IDAT, correct CRCs), the GIF carries a valid LZW-coded image (the
clear-code-per-pixel encoding — inefficient, legal), the BMP is an
uncompressed 24-bit file, and the JPEG is a structurally valid marker
stream (JFIF APP0 + DQT + SOF0 + DHT + SOS + EOI) whose SOF0 carries
the real dimensions; its entropy segment is minimal since only header
semantics are under test here.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# parsing

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> pixel-semantic channel count (type 3 = palette -> RGB).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}
# JPEG SOFn markers that carry frame dimensions (C4/C8/CC are DHT/JPG/DAC).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _parse_png(data: bytes):
    if len(data) < 26 or not data.startswith(_PNG_MAGIC):
        return None
    # First chunk must be IHDR: length(4) type(4) at offset 8.
    if data[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", data[16:24])
    color_type = data[25]
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None or width == 0 or height == 0:
        return None
    return ("png", width, height, channels)


def _parse_gif(data: bytes):
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", data[6:10])
    if width == 0 or height == 0:
        return None
    return ("gif", width, height, 3)


def _parse_bmp(data: bytes):
    if len(data) < 26 or data[:2] != b"BM":
        return None
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size >= 40:  # BITMAPINFOHEADER and successors
        if len(data) < 30:  # bpp field would read past a truncated buffer
            return None
        width = struct.unpack("<i", data[18:22])[0]
        height = abs(struct.unpack("<i", data[22:26])[0])  # may be top-down
        bpp = struct.unpack("<H", data[28:30])[0]
    elif hdr_size == 12:  # BITMAPCOREHEADER
        width, height = struct.unpack("<HH", data[18:22])
        bpp = struct.unpack("<H", data[24:26])[0]
    else:
        return None
    channels = {1: 3, 4: 3, 8: 3, 16: 3, 24: 3, 32: 4}.get(bpp)
    if channels is None or width <= 0 or height == 0:
        return None
    return ("bmp", width, height, channels)


def _parse_jpeg(data: bytes):
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None  # desynchronized marker stream
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if marker in _JPEG_SOF:
            if seg_len < 8:
                return None
            height, width = struct.unpack(">HH", data[i + 5 : i + 9])
            channels = data[i + 9]
            if width == 0 or height == 0 or channels == 0:
                return None
            return ("jpeg", width, height, channels)
        if marker == 0xDA:
            return None  # SOS reached without a frame header
        i += 2 + seg_len
    return None


def parse_image_header(data: bytes):
    """(fmt, width, height, channels) for PNG/GIF/BMP/JPEG payloads, or
    ``None`` if ``data`` is not a recognized image."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return None
    data = bytes(data)
    for parser in (_parse_png, _parse_gif, _parse_bmp, _parse_jpeg):
        out = parser(data)
        if out is not None:
            return out
    return None


# ---------------------------------------------------------------------------
# builders (fixture generation + parser tests)


def pattern_byte(x: int, y: int, c: int, base: int) -> int:
    """The fixture's deterministic pixel pattern: a position-dependent
    ramp the generator can evaluate WITHOUT decoding any payload, so
    expected resized bytes derive from this formula while the Spark
    side must inflate/unfilter/LZW-decode the actual files to match."""
    return (base + 3 * x + 5 * y + 17 * c) % 256


def _png_filter_row(
    raw: bytes, prev: bytes | None, spp: int, ft: int
) -> bytes:
    """Apply PNG filter ``ft`` to one raw scanline (encode side)."""
    n = len(raw)
    out = bytearray(n)
    for i in range(n):
        a = raw[i - spp] if i >= spp else 0
        b = prev[i] if prev is not None else 0
        c = prev[i - spp] if prev is not None and i >= spp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def build_png(
    width: int,
    height: int,
    channels: int = 3,
    pixel: int = 0,
    pattern: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Fully decodable PNG: real IHDR/IDAT/IEND with correct CRCs.
    Default: constant ``pixel`` bytes, filter 0 everywhere (the shape
    test_png_is_decodable_bytes pins). With ``pattern=base`` the image
    carries ``pattern_byte`` pixels and row ``y`` is encoded with
    filter type ``y % 5`` — every unfilter path in pixeldec.py is
    exercised by the committed fixture. ``interlace=True`` (pattern
    mode only) emits a real Adam7 stream: seven independently-filtered
    sub-images in pass order."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if interlace and pattern is None:
        raise ValueError("interlaced builder requires pattern mode")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    if pattern is None:
        raw_scan = b"\x00" + bytes([pixel % 256]) * (width * channels)
        idat = zlib.compress(raw_scan * height, 6)
    else:
        def filtered_rows(xs: list[int], ys: list[int]) -> bytes:
            """One sub-image: pattern pixels at (xs × ys), rows
            filtered with type row_index % 5."""
            scan = bytearray()
            prev: bytes | None = None
            for ri, y in enumerate(ys):
                raw = bytes(
                    pattern_byte(x, y, c, pattern)
                    for x in xs
                    for c in range(channels)
                )
                ft = ri % 5
                scan += bytes([ft]) + _png_filter_row(raw, prev, channels, ft)
                prev = raw
            return bytes(scan)

        if interlace:
            from .pixeldec import ADAM7

            scan_all = bytearray()
            for x0, y0, dx, dy in ADAM7:
                xs = list(range(x0, width, dx))
                ys = list(range(y0, height, dy))
                if xs and ys:
                    scan_all += filtered_rows(xs, ys)
            idat = zlib.compress(bytes(scan_all), 6)
        else:
            idat = zlib.compress(
                filtered_rows(list(range(width)), list(range(height))), 6
            )
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def png_palette_entry(i: int, c: int, base: int) -> int:
    """The palette-PNG fixture's palette formula: entry ``i``'s RGB
    channel ``c`` — evaluable without decoding any payload."""
    return (base + 7 * i + 11 * c) % 256


def png_palette_index(x: int, y: int, base: int, depth: int) -> int:
    """The palette-PNG fixture's index formula at (x, y)."""
    return (x + 2 * y + base) % (1 << depth)


def build_png_variant(
    width: int,
    height: int,
    base: int,
    depth: int,
    color: str = "gray",
    channels: int = 3,
) -> bytes:
    """Fully decodable PNG at NON-default bit depths — the wild
    variants build_png's 8-bit path never emits:

    - ``color='gray'``, depth 1/2/4: samples are
      ``pattern_byte(x, y, 0, base) >> (8 - depth)`` packed MSB-first
      with row padding (a correct decode scales them by
      255/(2^depth - 1));
    - ``color='gray'``/'rgb'/'rgba'/'ga', depth 16: each sample is
      ``(pattern_byte << 8) | 0x5A`` big-endian — the low byte is
      deliberately nonzero so a decoder taking the wrong byte fails
      loudly;
    - ``color='palette'``, depth 1/2/4/8: PLTE of 2^depth entries from
      ``png_palette_entry``; indices from ``png_palette_index``.

    Rows are filtered with type ``y % 5`` at the spec's byte distance
    (max(1, spp*depth//8)), so every unfilter path runs at every
    depth."""
    if color == "palette":
        if depth not in (1, 2, 4, 8):
            raise ValueError("palette depth must be 1/2/4/8")
        color_type, spp = 3, 1
    elif color == "gray":
        if depth not in (1, 2, 4, 16):
            raise ValueError("gray variant depth must be 1/2/4/16 (8 is build_png)")
        color_type, spp = 0, 1
    elif color in ("rgb", "rgba", "ga"):
        if depth != 16:
            raise ValueError("color variants are 16-bit only (8 is build_png)")
        color_type, spp = {"rgb": (2, 3), "rgba": (6, 4), "ga": (4, 2)}[color]
    else:
        raise ValueError(f"unknown variant {color!r}")
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    bpp = max(1, (spp * depth) // 8)

    def row_bytes(y: int) -> bytes:
        if depth == 16:
            out = bytearray()
            for x in range(width):
                for c in range(spp):
                    out += struct.pack(
                        ">H", (pattern_byte(x, y, c, base) << 8) | 0x5A
                    )
            return bytes(out)
        # sub-byte (or 8-bit palette) sample packing, MSB-first
        samples = []
        for x in range(width):
            if color == "palette":
                samples.append(png_palette_index(x, y, base, depth))
            else:
                samples.append(pattern_byte(x, y, 0, base) >> (8 - depth))
        out = bytearray()
        acc = n = 0
        for s in samples:
            acc = (acc << depth) | s
            n += depth
            while n >= 8:
                out.append((acc >> (n - 8)) & 0xFF)
                n -= 8
        if n:
            out.append((acc << (8 - n)) & 0xFF)
        return bytes(out)

    scan = bytearray()
    prev: bytes | None = None
    for y in range(height):
        raw = row_bytes(y)
        ft = y % 5
        scan += bytes([ft]) + _png_filter_row(raw, prev, bpp, ft)
        prev = raw
    chunks = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if color == "palette":
        plte = bytes(
            png_palette_entry(i, c, base)
            for i in range(1 << depth)
            for c in range(3)
        )
        chunks += _png_chunk(b"PLTE", plte)
    chunks += _png_chunk(b"IDAT", zlib.compress(bytes(scan), 6))
    return chunks + _png_chunk(b"IEND", b"")


def build_gif(
    width: int,
    height: int,
    pattern: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Valid GIF89a: 2-entry palette, LZW data via the legal (if
    inefficient) clear-code-before-every-pixel encoding. Default image
    is all palette-index 0; with ``pattern=base`` the image is the
    checkerboard ``(x + y + base) % 2`` over the black/white palette.
    ``interlace=True`` stores rows in the GIF89a 4-pass order."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += b"\xf0\x00\x00"  # GCT flag, 2-entry palette, bg 0, no aspect
    out += b"\x00\x00\x00\xff\xff\xff"  # palette: black, white
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += b"\x40" if interlace else b"\x00"
    out += b"\x02"  # LZW minimum code size
    # Codes are 3 bits wide (min size 2 -> initial width 3): clear=4,
    # end=5. Emit clear, then one palette-index code per pixel, then end.
    row_order = (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
        if interlace
        else list(range(height))
    )
    bits = []
    bits.append((4, 3))
    for y in row_order:
        for x in range(width):
            idx = 0 if pattern is None else (x + y + pattern) % 2
            bits.append((4, 3))  # re-clear keeps the code width fixed at 3
            bits.append((idx, 3))
    bits.append((5, 3))
    acc = n_acc = 0
    data = bytearray()
    for code, width_b in bits:
        acc |= code << n_acc
        n_acc += width_b
        while n_acc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def dib_pattern_rows(width: int, height: int, base: int) -> bytes:
    """Bottom-up BGR 4-byte-padded pixel rows of the ``pattern_byte``
    image — the DIB pixel-array layout shared by BMP files and AVI
    '00db' frames (videohdr.py builds frames from this exact helper,
    so the two builders cannot drift)."""
    pad = (-(width * 3)) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # file rows run bottom-up
        for x in range(width):
            body += bytes(pattern_byte(x, y, c, base) for c in (2, 1, 0))  # BGR
        body += b"\x00" * pad
    return bytes(body)


def build_bmp(
    width: int, height: int, pixel: int = 0, pattern: int | None = None
) -> bytes:
    """Uncompressed 24-bit BMP with 4-byte-aligned rows (bottom-up,
    BGR). With ``pattern=base`` pixel (x, y) carries ``pattern_byte``
    values in RGB semantics, stored in the file's BGR order."""
    pad = (-(width * 3)) % 4
    if pattern is None:
        rows = (bytes([pixel % 256]) * (width * 3) + b"\x00" * pad) * height
    else:
        rows = dib_pattern_rows(width, height, pattern)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + rows


BMP_PAL_SIZE = 16  # biClrUsed: a partial color table, exercised on purpose


def bmp_palette_index(x: int, y: int, base: int, rle: bool) -> int:
    """The palette-BMP fixture's index formula: the RLE form uses a
    run-friendly ramp (runs of 3 along x) so encoded-run packets
    actually occur; the uncompressed form varies per pixel."""
    if rle:
        return ((x // 3) + y + base) % BMP_PAL_SIZE
    return (x + 2 * y + base) % BMP_PAL_SIZE


def build_bmp_palette(
    width: int, height: int, base: int, rle: bool = False
) -> bytes:
    """8-bit PALETTE BMP — uncompressed (BI_RGB) or run-length coded
    (BI_RLE8): BITMAPINFOHEADER with biClrUsed=16, a BGRX color table
    from ``png_palette_entry`` (shared formula, generator-evaluable),
    bottom-up rows of ``bmp_palette_index`` indices. The RLE encoder
    mixes ENCODED RUNS (maximal same-index spans >= 3) with ABSOLUTE
    literals (word-padded) and terminates rows/bitmap with the 0,0 /
    0,1 escapes — every packet kind a GDI decoder must handle."""
    pal = bytes(
        b
        for i in range(BMP_PAL_SIZE)
        for b in (
            png_palette_entry(i, 2, base),  # blue
            png_palette_entry(i, 1, base),  # green
            png_palette_entry(i, 0, base),  # red
            0,
        )
    )
    idx_rows = [
        [bmp_palette_index(x, y, base, rle) for x in range(width)]
        for y in range(height)
    ]
    if not rle:
        stride_pad = (-width) % 4
        body = b"".join(
            bytes(row) + b"\x00" * stride_pad for row in reversed(idx_rows)
        )
        compression = 0
    else:
        out = bytearray()
        for row in reversed(idx_rows):  # bottom-up
            x = 0
            while x < len(row):
                run = 1
                while x + run < len(row) and row[x + run] == row[x] and run < 255:
                    run += 1
                if run >= 3:
                    out += bytes([run, row[x]])
                    x += run
                else:
                    lit = []
                    while (
                        x < len(row)
                        and len(lit) < 255
                        and not (
                            x + 2 < len(row)
                            and row[x] == row[x + 1] == row[x + 2]
                        )
                    ):
                        lit.append(row[x])
                        x += 1
                    if len(lit) >= 3:
                        out += bytes([0, len(lit)]) + bytes(lit)
                        if len(lit) & 1:
                            out.append(0)  # word padding
                    else:  # too short for absolute mode: emit as runs of 1
                        for v in lit:
                            out += bytes([1, v])
            out += b"\x00\x00"  # end of line
        out += b"\x00\x01"  # end of bitmap
        body = bytes(out)
        compression = 1
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, compression, len(body),
        2835, 2835, BMP_PAL_SIZE, 0,
    )
    pixel_off = 14 + 40 + len(pal)
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off)
    return header + info + pal + body


# Encoder Huffman layout (self-consistent — the tables ride in the
# file's DHT, so any conformant decoder uses exactly these): DC table
# 0 holds categories 0..11 as 4-bit canonical codes; AC table 0 holds
# the single EOB symbol as a 2-bit code (DC-only blocks never emit AC
# coefficients). Quant table 0 is flat 16s, chosen so a DC-only
# block's IDCT output is the exact integer 128 + 2*dc (dc*16/8): the
# encode-time pixel record needs no IDCT to derive.
_JPEG_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_SYMBOLS = list(range(12))
_JPEG_AC_COUNTS = [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_AC_SYMBOLS = [0x00]
_JPEG_Q = 16


def _jpeg_canonical_codes(counts: list[int]) -> list[tuple[int, int]]:
    codes = []
    code = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes.append((length, code))
            code += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    """MSB-first entropy writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad
        return bytes(self.out)


def jpeg_block_value(bx: int, by: int, base: int) -> int:
    """The flat pixel value of the 8x8 block at (bx, by) in a pattern
    JPEG: even-offset ramp around 128 so the quantized DC is exact."""
    return 128 + 2 * (((base + 3 * bx + 5 * by) % 128) - 64)


def build_jpeg(
    width: int,
    height: int,
    channels: int = 3,
    pattern: int | None = None,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """REAL JPEG: flat-16 quant table, canonical DHT, and Huffman-coded
    DC-only blocks (grayscale, 4:4:4, or 4:2:0 YCbCr with flat
    chroma). Any conformant decoder renders it. Default image is
    uniform 128 gray; with ``pattern=base`` each 8x8 LUMA block carries
    ``jpeg_block_value`` (global block coords, so the expected-pixel
    formula is identical across subsamplings) — decoded pixels are
    exactly predictable from block arithmetic (no IDCT needed), which
    is what the fixture's independence contract requires.

    ``progressive=True`` emits the SAME coefficients as an SOF2
    successive-approximation stream (T.81 G.2): an interleaved DC
    first scan at Al=1, a DC refinement scan appending bit 0, then one
    all-EOB AC scan per component — so baseline and progressive forms
    of one pattern decode to identical pixels."""
    if channels not in (1, 3):
        raise ValueError("baseline encoder supports 1 or 3 components")
    if subsampling not in ("444", "420") or (subsampling == "420" and channels != 3):
        raise ValueError("subsampling must be '444', or '420' with 3 components")
    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    dqt = b"\x00" + bytes([_JPEG_Q] * 64)  # table 0, flat, zigzag-invariant
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    luma_sampling = 0x22 if subsampling == "420" else 0x11
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for c in range(channels):
        sof += bytes([c + 1, luma_sampling if c == 0 else 0x11, 0])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += struct.pack(">H", 2 + len(sof)) + sof
    dht = b"\x00" + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMBOLS)
    dht += b"\x10" + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMBOLS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    dc_codes = _jpeg_canonical_codes(_JPEG_DC_COUNTS)
    (ac_eob_len, ac_eob_code) = _jpeg_canonical_codes(_JPEG_AC_COUNTS)[0]

    def luma_dc(bx: int, by: int) -> int:
        if pattern is None:
            return 0
        return (jpeg_block_value(bx, by, pattern) - 128) // 2

    # The block walk (interleaved MCU order) as (comp_index, dc) pairs —
    # shared by the baseline single scan and the progressive DC scans.
    blocks: list[tuple[int, int]] = []
    if subsampling == "420":
        # Interleaved MCUs of 16x16: 4 raster-ordered Y blocks (global
        # block coords my*2+vb / mx*2+hb) + one Cb + one Cr.
        for my in range((height + 15) // 16):
            for mx in range((width + 15) // 16):
                for vb in range(2):
                    for hb in range(2):
                        blocks.append((0, luma_dc(mx * 2 + hb, my * 2 + vb)))
                blocks.append((1, 0))
                blocks.append((2, 0))
    else:
        for by in range((height + 7) // 8):
            for bx in range((width + 7) // 8):
                blocks.append((0, luma_dc(bx, by)))
                for ci in range(1, channels):
                    blocks.append((ci, 0))  # chroma flat 128

    def write_dc(w: _JpegBitWriter, preds: list[int], ci: int, v: int) -> None:
        diff = v - preds[ci]
        preds[ci] = v
        s = diff.bit_length() if diff else 0
        length, code = dc_codes[s]
        w.write(code, length)
        if s:
            w.write(diff if diff > 0 else diff + (1 << s) - 1, s)

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        body += b"".join(bytes([cid, 0x00]) for cid in comp_ids)
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    if not progressive:
        out += sos_header([c + 1 for c in range(channels)], 0, 63, 0, 0)
        w = _JpegBitWriter()
        preds = [0] * channels
        for ci, dc in blocks:
            write_dc(w, preds, ci, dc)
            w.write(ac_eob_code, ac_eob_len)  # EOB: no AC coefficients
        out += w.flush()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    all_ids = [c + 1 for c in range(channels)]
    # Scan 1: DC first pass at Al=1 — diffs of (dc >> 1), arithmetic
    # shift per T.81's DC point transform (Python >> is arithmetic).
    out += sos_header(all_ids, 0, 0, 0, 1)
    w = _JpegBitWriter()
    preds = [0] * channels
    for ci, dc in blocks:
        write_dc(w, preds, ci, dc >> 1)
    out += w.flush()
    # Scan 2: DC refinement to Al=0 — one raw bit (dc & 1) per block;
    # the decoder ORs it into the two's-complement coefficient, which
    # reconstitutes negatives exactly ((dc>>1)<<1 | (dc&1) == dc).
    out += sos_header(all_ids, 0, 0, 1, 0)
    w = _JpegBitWriter()
    for _ci, dc in blocks:
        w.write(dc & 1, 1)
    out += w.flush()
    # AC scans: one per component (progressive AC scans must be
    # single-component), full band 1..63, all-EOB — symbol 0x00 is
    # EOBRUN=1, exactly one band-ending code per block over the
    # component's NON-interleaved (true-dims) block grid.
    hmax = vmax = 2 if subsampling == "420" else 1
    for c in range(channels):
        h_i = v_i = (2 if subsampling == "420" else 1) if c == 0 else 1
        cw = (width * h_i + hmax - 1) // hmax
        ch_ = (height * v_i + vmax - 1) // vmax
        n_blocks = ((cw + 7) // 8) * ((ch_ + 7) // 8)
        out += sos_header([c + 1], 1, 63, 0, 0)
        w = _JpegBitWriter()
        for _ in range(n_blocks):
            w.write(ac_eob_code, ac_eob_len)
        out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
