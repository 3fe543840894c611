"""Stdlib PIXEL decoders (PNG inflate+unfilter / GIF LZW / BMP raw):
spec checks on hand-assembled bytes (not via the builders), pattern
round trips covering every PNG filter type, malformed rejection,
resize arithmetic differentials, fixture self-consistency, and the
Spark path reproducing the generator's resized-pixel checksums.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from parallel_map_reduce_spark.multimodal.imagehdr import (
    build_bmp,
    build_gif,
    build_png,
    pattern_byte,
)
from parallel_map_reduce_spark.multimodal.pixeldec import (
    decode_bmp_pixels,
    decode_gif_pixels,
    decode_image_pixels,
    decode_png_pixels,
    fit_dims,
    resize_nearest,
)

FIXTURE = "/root/repo/refdata/image_fixture.parquet"


def _pattern_array(w: int, h: int, c: int, base: int) -> np.ndarray:
    a = np.zeros((h, w, c), np.uint8)
    for y in range(h):
        for x in range(w):
            for ch in range(c):
                a[y, x, ch] = pattern_byte(x, y, ch, base)
    return a


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize(("w", "h", "base"), [(9, 7, 0), (16, 5, 201), (5, 11, 77)])
def test_png_pattern_roundtrip_all_filters(channels, w, h, base):
    """h >= 5 rows cycle filters 0-4 (build_png uses y % 5), so every
    unfilter branch is exercised against the pattern formula."""
    dw, dh, dc, px = decode_png_pixels(build_png(w, h, channels, pattern=base))
    assert (dw, dh, dc) == (w, h, channels)
    got = np.frombuffer(px, np.uint8).reshape(h, w, channels)
    assert np.array_equal(got, _pattern_array(w, h, channels, base))


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize(
    ("w", "h", "base"),
    [(16, 16, 0), (13, 7, 42), (9, 21, 201), (1, 1, 5), (3, 10, 77), (10, 3, 9)],
)
def test_png_adam7_interlaced_roundtrip(channels, w, h, base):
    """Adam7 streams deinterlace to exactly the pattern image at
    arbitrary (incl. pass-degenerate) dimensions — same expectation
    as the progressive-free encode."""
    data = build_png(w, h, channels, pattern=base, interlace=True)
    dw, dh, dc, px = decode_png_pixels(data)
    assert (dw, dh, dc) == (w, h, channels)
    got = np.frombuffer(px, np.uint8).reshape(h, w, channels)
    assert np.array_equal(got, _pattern_array(w, h, channels, base))


def test_png_interlaced_equals_noninterlaced():
    """The two encodings of the same pattern image decode to identical
    bytes — the scatter indexing cannot drift from the sequential
    path."""
    for (w, h, c, b) in [(17, 11, 3, 33), (8, 8, 1, 0)]:
        plain = decode_png_pixels(build_png(w, h, c, pattern=b))[3]
        inter = decode_png_pixels(build_png(w, h, c, pattern=b, interlace=True))[3]
        assert plain == inter


def test_png_hand_built_filter2_scanlines():
    """A PNG assembled BY HAND with Up-filtered (type 2) scanlines —
    checks the decoder against the filter spec, not against build_png
    (whose encoder could share a mirrored bug)."""
    w, h = 3, 3
    rows = [bytes([10, 20, 30]), bytes([11, 22, 33]), bytes([13, 25, 37])]
    scan = b"\x00" + rows[0]  # first row: filter None
    for y in (1, 2):  # subsequent rows: filter Up stores row - prev
        scan += b"\x02" + bytes((rows[y][i] - rows[y - 1][i]) & 0xFF for i in range(w))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # grayscale

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    dw, dh, dc, px = decode_png_pixels(data)
    assert (dw, dh, dc) == (w, h, 1)
    assert px == b"".join(rows)


def test_png_paeth_hand_vector():
    """Paeth (type 4) hand vector: reconstruct a 2x2 RGB image whose
    second row is Paeth-filtered, with predictor values worked out by
    hand from the spec (a=left, b=up, c=up-left)."""
    row0 = bytes([100, 0, 50, 10, 200, 30])
    row1 = bytes([110, 5, 60, 20, 190, 40])
    # filter row1: for i<3 pred=b (up); for i>=3 pred=closest of a,b,c
    filt = bytearray()
    for i in range(6):
        a = row1[i - 3] if i >= 3 else 0
        b = row0[i]
        c = row0[i - 3] if i >= 3 else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        filt.append((row1[i] - pred) & 0xFF)
    scan = b"\x00" + row0 + b"\x04" + bytes(filt)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(data)[3] == row0 + row1


def test_gif_pattern_checkerboard():
    for (w, h, base) in [(8, 8, 0), (13, 7, 1), (31, 9, 254)]:
        dw, dh, dc, px = decode_gif_pixels(build_gif(w, h, pattern=base))
        assert (dw, dh, dc) == (w, h, 3)
        got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        exp = np.repeat((((xs + ys + base) % 2) * 255).astype(np.uint8)[:, :, None], 3, axis=2)
        assert np.array_equal(got, exp)


def test_gif_lzw_kwkwk_case():
    """Hand-packed LZW stream hitting the KwKwK (code == next_code)
    corner the clear-per-pixel builder never emits: codes
    [clear, 0, 6] decode to 0,0,0 (entry 6 = prev + prev[0])."""
    out = bytearray(b"GIF89a") + struct.pack("<HH", 3, 1)
    out += b"\xf0\x00\x00" + b"\x00\x00\x00\xff\xff\xff"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 1) + b"\x00" + b"\x02"
    acc = n = 0
    data = bytearray()
    for code in (4, 0, 6, 5):  # clear, '0', KwKwK, end — 3-bit codes
        acc |= code << n
        n += 3
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    out += bytes([len(data)]) + bytes(data) + b"\x00\x3b"
    dw, dh, dc, px = decode_gif_pixels(bytes(out))
    assert (dw, dh, dc, px) == (3, 1, 3, b"\x00" * 9)


def test_gif_lzw_code_width_growth():
    """Hand-packed LZW stream that crosses the 3->4-bit code-width
    boundary WITHOUT re-clearing (the clear-per-pixel builder never
    does this): with min code size 2, the decoder's table grows on
    each decoded symbol after the first, and the width must bump
    exactly when next_code reaches 1<<code_size. Codes: clear,0,1,0
    at 3 bits (table reaches 8 entries), then 1,0 at 4 bits, end."""
    out = bytearray(b"GIF89a") + struct.pack("<HH", 5, 1)
    out += b"\xf0\x00\x00" + b"\x00\x00\x00\xff\xff\xff"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 5, 1) + b"\x00" + b"\x02"
    acc = n = 0
    data = bytearray()
    for code, width in ((4, 3), (0, 3), (1, 3), (0, 3), (1, 4), (0, 4), (5, 4)):
        acc |= code << n
        n += width
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    out += bytes([len(data)]) + bytes(data) + b"\x00\x3b"
    dw, dh, dc, px = decode_gif_pixels(bytes(out))
    assert (dw, dh, dc) == (5, 1, 3)
    got = np.frombuffer(px, np.uint8).reshape(1, 5, 3)[0, :, 0]
    assert got.tolist() == [0, 255, 0, 255, 0]


@pytest.mark.parametrize(("w", "h", "base"), [(8, 8, 0), (13, 9, 5), (5, 17, 200), (7, 1, 3)])
def test_gif_interlaced_roundtrip(w, h, base):
    """GIF89a interlaced storage (4-pass row order) deinterlaces to
    the same checkerboard as sequential storage."""
    plain = decode_gif_pixels(build_gif(w, h, pattern=base))
    inter = decode_gif_pixels(build_gif(w, h, pattern=base, interlace=True))
    assert plain == inter


def test_bmp_32bit_bgra():
    """A hand-assembled uncompressed 32-bit BMP decodes BGRA -> RGBA
    with the alpha channel preserved in place."""
    w, h = 3, 2
    px = [
        [(10, 20, 30, 40), (50, 60, 70, 80), (90, 100, 110, 120)],
        [(1, 2, 3, 4), (5, 6, 7, 8), (9, 10, 11, 12)],
    ]
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        for r, g, b, a in px[y]:
            rows += bytes([b, g, r, a])
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    dw, dh, dc, out = decode_bmp_pixels(bytes(header + info + rows))
    assert (dw, dh, dc) == (w, h, 4)
    got = np.frombuffer(out, np.uint8).reshape(h, w, 4)
    assert got.tolist() == [[list(p) for p in row] for row in px]


def test_bmp_pattern_and_topdown():
    w, h, base = 7, 5, 33
    dw, dh, dc, px = decode_bmp_pixels(build_bmp(w, h, pattern=base))
    assert (dw, dh, dc) == (w, h, 3)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(h, w, 3), _pattern_array(w, h, 3, base)
    )
    # Top-down variant (negative height) assembled by hand: same pixels
    # stored in image order must decode identically WITHOUT the flip.
    up = build_bmp(w, h, pattern=base)
    stride = (w * 3 + 3) & ~3
    (pixel_off,) = struct.unpack("<I", up[10:14])
    rows = up[pixel_off:]
    flipped = b"".join(
        rows[(h - 1 - y) * stride : (h - y) * stride] for y in range(h)
    )
    down = bytearray(up[:pixel_off] + flipped)
    down[22:26] = struct.pack("<i", -h)
    assert decode_bmp_pixels(bytes(down))[3] == px


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"not an image",
        b"\xff\xd8\xff",  # truncated JPEG
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 30,  # magic, garbage chunks
        b"BM" + b"\x00" * 30,  # truncated BMP
        b"GIF89a" + struct.pack("<HH", 4, 4),  # GIF with no image data
    ],
)
def test_undecodable_raises(junk):
    with pytest.raises(ValueError):
        decode_image_pixels(junk)


def test_png_huge_interlaced_dims_raise_valueerror_not_memoryerror():
    """Advisor r11: a crafted Adam7 PNG claiming 64k x 64k must fail
    the scanline-length validation (ValueError) BEFORE the decoder
    allocates a height*width*spp grid (MemoryError would escape
    resize_map's skip logic and kill the Spark task)."""

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 65536, 65536, 8, 2, 0, 0, 1)  # interlaced
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_pixels(data)
    with pytest.raises(ValueError):
        decode_image_pixels(data)


def test_jpeg_huge_declared_dims_raise_valueerror_not_memoryerror():
    """Same hardening for JPEG: SOF0 declaring 64k x 64k with a tiny
    entropy segment must be rejected before plane allocation."""
    from parallel_map_reduce_spark.multimodal.jpegdec import decode_jpeg_pixels

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    dht_dc = seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    dht_ac = seg(0xC4, b"\x10" + bytes([1] + [0] * 15) + b"\x00")
    sof = seg(0xC0, b"\x08" + struct.pack(">HH", 65535, 65535) + b"\x01" + b"\x01\x11\x00")
    sos = seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
    data = b"\xff\xd8" + dqt + dht_dc + dht_ac + sof + sos + b"\x00" * 32 + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg_pixels(data)
    with pytest.raises(ValueError):
        decode_image_pixels(data)


def test_png_bad_filter_type_raises():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x05\x00\x00")) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_pixels(data)


def test_fit_dims_and_resize_differential():
    """fit_dims edge cases + resize_nearest vs an independent pure-
    Python double loop on pattern pixels."""
    assert fit_dims(1, 1, 256) == (256, 256)
    assert fit_dims(512, 256, 256) == (256, 128)
    assert fit_dims(1000, 3, 256) == (256, 1)  # clamp, never 0
    w, h, c, base = 13, 7, 3, 99
    px = _pattern_array(w, h, c, base).tobytes()
    out_w, out_h = fit_dims(w, h, 16)
    got = resize_nearest(px, w, h, c, out_w, out_h)
    exp = bytearray()
    for oy in range(out_h):
        for ox in range(out_w):
            sx, sy = ox * w // out_w, oy * h // out_h
            for ch in range(c):
                exp.append(pattern_byte(sx, sy, ch, base))
    assert got == bytes(exp)


def test_fixture_decode_matches_encode_record():
    """EVERY fixture payload — JPEG included — decodes + resizes to
    exactly the generator's expectation (out dims AND resized-pixel
    CRC, derived from the pattern formulas, never from the payload)."""
    import pyarrow.parquet as pq

    t = pq.read_table(FIXTURE)
    n_checked = 0
    for d, fmt, payload, w, h, c, ow, oh, crc in zip(
        *[
            t[col].to_pylist()
            for col in (
                "doc_id", "fmt", "payload", "exp_width", "exp_height",
                "exp_channels", "exp_out_width", "exp_out_height",
                "exp_resized_crc32",
            )
        ]
    ):
        f2, dw, dh, dc, px = decode_image_pixels(payload)
        assert (f2, dw, dh, dc) == (fmt, w, h, c), d
        gw, gh = fit_dims(dw, dh, 256)
        assert (gw, gh) == (ow, oh), d
        resized = resize_nearest(px, dw, dh, dc, gw, gh)
        assert zlib.crc32(resized) & 0xFFFFFFFF == crc, d
        n_checked += 1
    assert n_checked == 5000  # all four formats decode for real


def test_map_in_pandas_real_resize_checksums(spark):
    """The registered query's Spark path reproduces the generator's
    resized-pixel CRCs for all 500 docs — JPEG rows included."""
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.queries.multimodal import (
        multimodal_image_resize,
    )

    rows = {
        r.doc_id: r
        for r in multimodal_image_resize(spark, "/root/testdata/sf0.001").collect()
    }
    t = pq.read_table(FIXTURE).slice(0, 500)
    for d, fmt, ow, oh, crc in zip(
        t["doc_id"].to_pylist(),
        t["fmt"].to_pylist(),
        t["exp_out_width"].to_pylist(),
        t["exp_out_height"].to_pylist(),
        t["exp_resized_crc32"].to_pylist(),
    ):
        r = rows[d]
        assert r.fmt == fmt, d
        assert (r.out_width, r.out_height, r.resized_crc32) == (ow, oh, crc), d
    assert len(rows) == 500


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_low_depth_gray_scales_to_full_range(depth):
    """Sub-byte grayscale: packed MSB-first levels decode to
    v * 255 / (2^depth - 1), exactly (integer arithmetic)."""
    from parallel_map_reduce_spark.multimodal.imagehdr import (
        build_png_variant,
        pattern_byte,
    )

    w, h = 13, 7
    data = build_png_variant(w, h, 42, depth, "gray")
    fmt, dw, dh, ch, px = decode_image_pixels(data)
    assert (fmt, dw, dh, ch) == ("png", w, h, 1)
    arr = list(px)
    for y in range(h):
        for x in range(w):
            lev = pattern_byte(x, y, 0, 42) >> (8 - depth)
            assert arr[y * w + x] == lev * 255 // ((1 << depth) - 1)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_palette_depths_dereference(depth):
    """Palette PNGs at every legal index depth dereference through the
    PLTE to the formula RGB."""
    from parallel_map_reduce_spark.multimodal.imagehdr import (
        build_png_variant,
        png_palette_entry,
        png_palette_index,
    )

    w, h = 10, 6
    data = build_png_variant(w, h, 99, depth, "palette")
    fmt, dw, dh, ch, px = decode_image_pixels(data)
    assert (fmt, dw, dh, ch) == ("png", w, h, 3)
    for y in range(h):
        for x in range(w):
            i = png_palette_index(x, y, 99, depth)
            got = px[(y * w + x) * 3 : (y * w + x) * 3 + 3]
            assert tuple(got) == tuple(
                png_palette_entry(i, c, 99) for c in range(3)
            ), (depth, x, y)


@pytest.mark.parametrize("color", ["gray", "rgb", "rgba", "ga"])
def test_png_16bit_takes_high_byte(color):
    """16-bit samples decode to their high byte — the builder plants a
    nonzero LOW byte (0x5A) so a wrong-byte decoder fails loudly."""
    from parallel_map_reduce_spark.multimodal.imagehdr import (
        build_png_variant,
        pattern_byte,
    )

    w, h = 9, 5
    data = build_png_variant(w, h, 7, 16, color)
    fmt, dw, dh, ch, px = decode_image_pixels(data)
    assert (dw, dh) == (w, h)
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                assert px[(y * w + x) * ch + c] == pattern_byte(x, y, c, 7)


def test_png_illegal_depth_type_combo_rejected():
    """Depths illegal for the color type (16-bit palette, 2-bit
    truecolor) are loud rejections per the PNG spec."""
    base = zlib  # silence linters; zlib imported at module top

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    for color_type, depth in ((3, 16), (2, 2), (6, 4)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color_type, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 20)) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png_pixels(data)


@pytest.mark.parametrize("rle", [False, True])
def test_bmp_palette_roundtrip(rle):
    """8-bit palette BMPs (uncompressed and BI_RLE8) dereference their
    BGRX color table to the formula RGB, bottom-up rows flipped."""
    from parallel_map_reduce_spark.multimodal.imagehdr import (
        bmp_palette_index,
        build_bmp_palette,
        png_palette_entry,
    )

    for (w, h, base) in ((13, 7, 42), (31, 9, 200), (1, 1, 7)):
        data = build_bmp_palette(w, h, base, rle=rle)
        fmt, dw, dh, ch, px = decode_image_pixels(data)
        assert (fmt, dw, dh, ch) == ("bmp", w, h, 3)
        for y in range(h):
            for x in range(w):
                i = bmp_palette_index(x, y, base, rle)
                got = px[(y * w + x) * 3 : (y * w + x) * 3 + 3]
                assert tuple(got) == tuple(
                    png_palette_entry(i, c, base) for c in range(3)
                ), (rle, x, y)


def test_bmp_rle8_hand_stream_with_delta_and_absolute():
    """Hand-assembled RLE8 stream exercising the packets the builder
    composes differently: an encoded run, an absolute block (with word
    padding), a DELTA escape (skipped pixels stay index 0 — the GDI
    default), end-of-line, and end-of-bitmap."""
    w, h = 8, 2
    pal = b"".join(bytes([10 * i, 20 * i, 30 * i, 0]) for i in range(4))
    # bottom row (y=1 after flip... RLE rows are bottom-up): run 3x idx1,
    # absolute [2,3,2] (padded), delta skips 2, end of line;
    # top row: run 8x idx3, end of bitmap.
    body = bytes(
        [3, 1, 0, 3, 2, 3, 2, 0, 0, 2, 2, 0, 0, 0]
        + [8, 3, 0, 1]
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body), 0, 0, 4, 0)
    off = 14 + 40 + len(pal)
    data = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off) + info + pal + body
    fmt, dw, dh, ch, px = decode_image_pixels(data)
    assert (fmt, dw, dh, ch) == ("bmp", w, h, 3)
    import numpy as np

    arr = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    pal_rgb = [(30 * i, 20 * i, 10 * i) for i in range(4)]  # BGRX -> RGB
    exp_bottom = [1, 1, 1, 2, 3, 2, 0, 0]  # delta-skipped stay 0
    exp_top = [3] * 8
    for x in range(w):
        assert tuple(arr[1, x]) == pal_rgb[exp_bottom[x]], x  # flipped
        assert tuple(arr[0, x]) == pal_rgb[exp_top[x]], x
