"""Stdlib PIXEL decoders: full image decode for PNG / GIF / BMP from
raw bytes — no PIL/opencv, only ``zlib`` + ``struct`` — plus an
integer nearest-neighbor resize.

This closes the last image stub in codec.py (rounds ≤11 kept pixel
decode behind ``NotImplementedError``): PNG (every legal bit depth —
1/2/4-bit packed grayscale and palette, 8-bit, 16-bit high-byte
downconversion — incl. Adam7 interlace at any depth), GIF (incl.
interlace), and BMP (24/32-bit, 8-bit palette, and BI_RLE8
run-length coding) decode fully here, and
JPEG dispatches to ``jpegdec.decode_jpeg_pixels`` — a real
Huffman+IDCT decoder covering baseline (SOF0) AND progressive (SOF2)
frames, grayscale and 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 color (sampling
factors 1-2 per axis). Unsupported JPEG variants (arithmetic coding,
lossless, hierarchical) raise
``ValueError`` and callers (codec.py:resize_map) skip those rows.
Reference basis: the public PNG (RFC 2083), GIF89a, BMP, and
ITU-T T.81 specifications; no reference-repo counterpart exists
(``/root/reference`` is text-only — this is north-star scope).

Decoder contract: ``decode_image_pixels(data)`` returns
``(fmt, width, height, channels, pixels)`` where ``pixels`` is
row-major, channel-interleaved ``bytes`` of length
``width*height*channels``. Palette formats (GIF, palette PNG)
dereference to RGB (channels == 3); BMP's stored BGR order is swapped
to RGB so all formats share one pixel semantics.

Scale shape: decode runs inside Arrow ``mapInPandas`` batches
(codec.py) — per-row Python cost is the codec itself, which is the
irreducible cost of any pixel pipeline; at 100 TB the balance knobs
are payload-size salting and batch size, not the decoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .imagehdr import _PNG_MAGIC

# ---------------------------------------------------------------------------
# PNG — RFC 2083: chunk walk, zlib inflate, per-row unfilter, palette deref.

# color type -> samples per pixel as STORED (palette stores 1 index).
_PNG_RAW_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_stride_bpp(width: int, spp: int, depth: int) -> tuple[int, int]:
    """(row stride in bytes, filter byte-distance bpp) for a scanline
    of ``width`` pixels at ``spp`` samples of ``depth`` bits each —
    sub-byte depths pack MSB-first with row padding, and the filter
    predictors step whole bytes (bpp >= 1), per the PNG spec."""
    stride = (width * spp * depth + 7) // 8
    bpp = max(1, (spp * depth) // 8)
    return stride, bpp


def _png_unfilter(raw: bytes, width: int, height: int, spp: int, depth: int = 8) -> bytearray:
    """Reverse PNG row filters (types 0-4) at any bit depth: filtering
    operates on the raw scanline BYTES with predictor distance bpp
    (ceil(spp*depth/8), floored at 1 for sub-byte depths)."""
    stride, spp = _png_stride_bpp(width, spp, depth)
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data does not match declared dimensions")
    out = bytearray(stride * height)
    prev_start = -1  # start index of previous reconstructed row, or -1
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        o = y * stride
        if ft == 0:  # None
            out[o : o + stride] = row
        elif ft == 1:  # Sub
            for i in range(stride):
                left = out[o + i - spp] if i >= spp else 0
                out[o + i] = (row[i] + left) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                up = out[prev_start + i] if prev_start >= 0 else 0
                out[o + i] = (row[i] + up) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = out[o + i - spp] if i >= spp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                out[o + i] = (row[i] + ((left + up) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = out[o + i - spp] if i >= spp else 0
                b = out[prev_start + i] if prev_start >= 0 else 0
                c = out[prev_start + i - spp] if prev_start >= 0 and i >= spp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out[o + i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft} is invalid")
        prev_start = o
    return out


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step).
ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_samples(
    unfiltered: bytes, width: int, height: int, spp: int, depth: int
) -> np.ndarray:
    """(height, width, spp) uint8 samples from unfiltered scanline
    bytes at any supported depth: sub-byte samples unpack MSB-first
    (row padding bits discarded); 16-bit samples take their high byte
    (the standard 8-bit downconversion); gray sub-byte samples are
    left as raw levels — callers scale or palette-dereference."""
    stride, _ = _png_stride_bpp(width, spp, depth)
    rows = np.frombuffer(unfiltered, np.uint8).reshape(height, stride)
    if depth == 8:
        return rows[:, : width * spp].reshape(height, width, spp)
    if depth == 16:
        return rows[:, : width * spp * 2].reshape(height, width, spp, 2)[..., 0]
    # depths 1/2/4: unpack bits per row, MSB-first
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : width * spp * depth].reshape(height, width * spp, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (per * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(height, width, spp)


def _adam7_pass_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass_width, pass_height) per Adam7 pass; (0, 0) for empty."""
    dims = []
    for x0, y0, dx, dy in ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        dims.append((pw, ph) if pw and ph else (0, 0))
    return dims


def _png_deinterlace(
    raw: bytes, width: int, height: int, spp: int, depth: int = 8
) -> bytes:
    """Reassemble an Adam7 stream: seven independently-filtered
    sub-images scattered onto the full-size sample grid; empty passes
    contribute no bytes at all (per the spec). Returns one uint8
    sample per (pixel, channel) — 16-bit high bytes / sub-byte raw
    levels, same as _png_samples."""
    # Validate header-declared dims against the actual inflated byte
    # count BEFORE allocating height*width*spp — a crafted header
    # claiming huge dims must fail as ValueError, not MemoryError.
    dims = _adam7_pass_dims(width, height)
    expected = sum(
        (_png_stride_bpp(pw, spp, depth)[0] + 1) * ph for pw, ph in dims if pw
    )
    if len(raw) != expected:
        raise ValueError("PNG interlaced scanline data does not match dimensions")
    out = np.zeros((height, width, spp), np.uint8)
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(ADAM7, dims):
        if pw == 0:
            continue
        span = (_png_stride_bpp(pw, spp, depth)[0] + 1) * ph
        sub = _png_unfilter(raw[pos : pos + span], pw, ph, spp, depth)
        pos += span
        out[y0::dy, x0::dx] = _png_samples(bytes(sub), pw, ph, spp, depth)
    return out.tobytes()


# Legal (color_type, bit_depth) pairs per the PNG spec.
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def decode_png_pixels(data: bytes):
    """(width, height, channels, pixels) for a PNG of color type
    0/2/3/4/6 at any legal bit depth (1/2/4/8/16 per type),
    non-interlaced or Adam7. Palette images dereference to RGB;
    sub-byte grayscale levels scale to full 8-bit range
    (v * 255 / (2^depth - 1), exact integers); 16-bit samples take
    their high byte — the standard 8-bit downconversion."""
    if not data.startswith(_PNG_MAGIC) or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    width, height = struct.unpack(">II", data[16:24])
    bit_depth, color_type, comp, filt, interlace = data[24:29]
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    spp = _PNG_RAW_SAMPLES.get(color_type)
    if spp is None:
        raise ValueError(f"invalid PNG color type {color_type}")
    if bit_depth not in _PNG_DEPTHS[color_type]:
        raise ValueError(
            f"invalid PNG bit depth {bit_depth} for color type {color_type}"
        )
    idat = bytearray()
    palette = None
    off = 8
    while off + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        if ctype == b"IDAT":
            idat += payload
        elif ctype == b"PLTE":
            palette = payload
        elif ctype == b"IEND":
            break
        off += 12 + ln
    if not idat:
        raise ValueError("PNG has no IDAT")
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        samples = np.frombuffer(
            _png_deinterlace(raw, width, height, spp, bit_depth), np.uint8
        )
    else:
        samples = _png_samples(
            bytes(_png_unfilter(raw, width, height, spp, bit_depth)),
            width, height, spp, bit_depth,
        ).reshape(-1)
    if color_type == 3:
        if palette is None or len(palette) % 3:
            raise ValueError("palette PNG without a valid PLTE")
        pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
        if int(samples.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        return width, height, 3, pal[samples].tobytes()
    if bit_depth in (1, 2, 4):  # grayscale levels -> full 8-bit range
        samples = (
            samples.astype(np.int64) * 255 // ((1 << bit_depth) - 1)
        ).astype(np.uint8)
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    return width, height, channels, samples.tobytes()


# ---------------------------------------------------------------------------
# GIF — GIF89a: LZW-decode the first image, dereference the palette.


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """Generic GIF LZW decoder (variable code width, LSB-first)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset_table():
        nonlocal table, code_size, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        next_code = end + 1

    code_size = min_code_size + 1
    next_code = end + 1
    reset_table()
    acc = n_bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n_bits -= code_size
            if code == clear:
                reset_table()
                prev = None
                continue
            if code == end:
                return bytes(out[:n_pixels])
            if code < next_code:  # clear/end handled above, so a real entry
                entry = table[code]
            elif code == next_code and prev is not None:  # KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    raise ValueError("GIF LZW stream ended before the image was complete")


def decode_gif_pixels(data: bytes):
    """(width, height, 3, rgb_pixels) for a non-interlaced full-frame
    GIF87a/89a first image."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            interlaced = bool(iflags & 0x40)
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = data[pos : pos + 3 * n]
                pos += 3 * n
            if (left, top, iw, ih) != (0, 0, width, height):
                raise ValueError("partial-frame GIF not supported")
            if palette is None:
                raise ValueError("GIF with no palette")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos]:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            idx = np.frombuffer(
                _gif_lzw_decode(min_code, bytes(lzw), width * height), np.uint8
            )
            if len(idx) != width * height:
                raise ValueError("GIF pixel count mismatch")
            if interlaced:
                # GIF89a interlace: rows stored in 4 passes
                # (0,8,16.. / 4,12.. / 2,6,10.. / 1,3,5..) — a pure
                # row permutation of the LZW output.
                rows = idx.reshape(height, width)
                out_rows = np.empty_like(rows)
                order = (
                    list(range(0, height, 8))
                    + list(range(4, height, 8))
                    + list(range(2, height, 4))
                    + list(range(1, height, 2))
                )
                for stored, target in enumerate(order):
                    out_rows[target] = rows[stored]
                idx = out_rows.reshape(-1)
            pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
            if int(idx.max(initial=0)) >= pal.shape[0]:
                raise ValueError("GIF palette index out of range")
            return width, height, 3, pal[idx].tobytes()
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit BITMAPINFOHEADER, bottom-up or top-down.


def _bmp_rle8_indices(body: bytes, width: int, height: int) -> np.ndarray:
    """Decode a BI_RLE8 pixel stream to a bottom-up (height, width)
    index grid (unwritten pixels default to 0, the Windows GDI
    behavior): encoded runs (count, index), absolute literals
    (0, n>=3: n indices, word-padded), end-of-line (0,0),
    end-of-bitmap (0,1), and position deltas (0,2, dx, dy)."""
    grid = np.zeros((height, width), np.uint8)
    x = y = pos = 0
    n = len(body)
    while pos + 1 < n:
        a, b = body[pos], body[pos + 1]
        pos += 2
        if a > 0:  # encoded run: a copies of index b
            if y >= height or x + a > width:
                raise ValueError("BMP RLE8 run overflows the bitmap")
            grid[y, x : x + a] = b
            x += a
        elif b == 0:  # end of line
            x, y = 0, y + 1
        elif b == 1:  # end of bitmap
            return grid
        elif b == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("BMP RLE8 delta truncated")
            x += body[pos]
            y += body[pos + 1]
            pos += 2
            if x > width or y > height:
                raise ValueError("BMP RLE8 delta out of bounds")
        else:  # absolute mode: b literal indices, padded to word size
            if y >= height or x + b > width or pos + b > n:
                raise ValueError("BMP RLE8 absolute run overflows")
            grid[y, x : x + b] = np.frombuffer(body[pos : pos + b], np.uint8)
            x += b
            pos += b + (b & 1)
    raise ValueError("BMP RLE8 stream missing end-of-bitmap")


def decode_bmp_pixels(data: bytes):
    """(width, height, channels, pixels) for a 24-bit (BGR → RGB) or
    32-bit (BGRA → RGBA) uncompressed BMP, or an 8-bit PALETTE BMP —
    uncompressed (BI_RGB) or run-length coded (BI_RLE8) — dereferenced
    to RGB through its BGRX color table (biClrUsed honored)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP core headers not supported for pixel decode")
    width = struct.unpack("<i", data[18:22])[0]
    raw_height = struct.unpack("<i", data[22:26])[0]
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    height = abs(raw_height)
    if width <= 0 or height == 0:
        raise ValueError("invalid BMP dimensions")
    if bpp == 8 and compression in (0, 1):
        clr_used = struct.unpack("<I", data[46:50])[0] or 256
        pal_at = 14 + hdr_size
        pal_bytes = data[pal_at : pal_at + 4 * clr_used]
        if len(pal_bytes) < 4 * clr_used:
            raise ValueError("truncated BMP color table")
        pal = np.frombuffer(pal_bytes, np.uint8).reshape(-1, 4)[:, 2::-1]  # BGRX->RGB
        if compression == 1:  # BI_RLE8 (bottom-up by definition)
            if raw_height < 0:
                raise ValueError("top-down RLE8 BMP is invalid")
            idx = _bmp_rle8_indices(data[pixel_off:], width, height)[::-1]
        else:
            stride = (width + 3) & ~3
            need = pixel_off + stride * height
            if len(data) < need:
                raise ValueError("truncated BMP pixel array")
            rows = np.frombuffer(data[pixel_off:need], np.uint8).reshape(
                height, stride
            )
            idx = rows[:, :width]
            if raw_height > 0:
                idx = idx[::-1]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("BMP palette index out of range")
        return width, height, 3, np.ascontiguousarray(pal[idx]).tobytes()
    if bpp not in (24, 32) or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    need = pixel_off + stride * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(data[pixel_off:need], np.uint8).reshape(height, stride)
    img = rows[:, : width * nch].reshape(height, width, nch)
    if raw_height > 0:  # bottom-up storage
        img = img[::-1]
    if nch == 3:
        return width, height, 3, img[:, :, ::-1].tobytes()  # BGR -> RGB
    # 32-bit: BGRA -> RGBA (alpha stays last)
    return width, height, 4, img[:, :, [2, 1, 0, 3]].tobytes()


# ---------------------------------------------------------------------------
# dispatch + resize


def decode_image_pixels(data: bytes):
    """(fmt, width, height, channels, pixels) for PNG/GIF/BMP/JPEG
    payloads (JPEG: 8-bit baseline SOF0 or progressive SOF2, grayscale
    or YCbCr with sampling factors 1-2 per axis — jpegdec.py;
    arithmetic-coded / lossless / hierarchical files raise). Raises ValueError for
    anything unrecognized or corrupt."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("payload is not bytes")
    data = bytes(data)
    try:
        if data.startswith(_PNG_MAGIC):
            return ("png",) + decode_png_pixels(data)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return ("gif",) + decode_gif_pixels(data)
        if data[:2] == b"BM":
            return ("bmp",) + decode_bmp_pixels(data)
        if data[:2] == b"\xff\xd8":
            from .jpegdec import decode_jpeg_pixels

            return ("jpeg",) + decode_jpeg_pixels(data)
    except (IndexError, struct.error, zlib.error, MemoryError) as exc:
        # Truncated/corrupt containers surface as one error type.
        # MemoryError belongs here too: a malformed header whose
        # declared dims slip past a decoder's pre-allocation checks is
        # still a corrupt payload, never a task-killing condition.
        raise ValueError(f"corrupt image payload: {exc}") from exc
    raise ValueError("no stdlib pixel decoder for this payload")


def fit_dims(width: int, height: int, target: int) -> tuple[int, int]:
    """Aspect-preserving fit of the long edge to ``target`` with the
    exact integer arithmetic the fixture generator mirrors:
    ``out = edge * target // long_edge`` (floored, never below 1)."""
    long_edge = max(width, height)
    return (
        max(1, width * target // long_edge),
        max(1, height * target // long_edge),
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample with the floor mapping
    ``src = out_index * in_edge // out_edge`` — pure integer arithmetic,
    so an independent implementation reproduces it byte-for-byte."""
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    ys = (np.arange(out_h, dtype=np.int64) * height) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * width) // out_w
    return arr[ys][:, xs].tobytes()
