"""Stdlib image-header codec: build→parse round trips on hand-built
bytes, malformed-input rejection, fixture self-consistency, and the
Arrow mapInPandas path computing TRUE dimensions (VERDICT r10 task 5).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from parallel_map_reduce_spark.multimodal.imagehdr import (
    build_bmp,
    build_gif,
    build_jpeg,
    build_png,
    parse_image_header,
)

FIXTURE = "/root/repo/refdata/image_fixture.parquet"


@pytest.mark.parametrize(
    ("builder", "fmt", "w", "h", "c"),
    [
        (lambda: build_png(48, 36, 3), "png", 48, 36, 3),
        (lambda: build_png(7, 5, 4), "png", 7, 5, 4),
        (lambda: build_png(1, 1, 1), "png", 1, 1, 1),
        (lambda: build_gif(64, 2), "gif", 64, 2, 3),
        (lambda: build_bmp(24, 18), "bmp", 24, 18, 3),
        (lambda: build_jpeg(640, 480, 3), "jpeg", 640, 480, 3),
        (lambda: build_jpeg(9, 9, 1), "jpeg", 9, 9, 1),
    ],
)
def test_build_parse_roundtrip(builder, fmt, w, h, c):
    assert parse_image_header(builder()) == (fmt, w, h, c)


def test_hand_built_png_bytes():
    """Parse a PNG assembled BY HAND here (not via build_png), so the
    parser is checked against the spec, not against its own builder."""
    ihdr = struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    data = b"\x89PNG\r\n\x1a\n" + chunk
    assert parse_image_header(data) == ("png", 320, 200, 3)


def test_png_is_decodable_bytes():
    """The built PNG's IDAT inflates to exactly the declared scanlines —
    a real file a pixel decoder could consume, not just a header."""
    w, h, px = 5, 3, 7
    data = build_png(w, h, 3, pixel=px)
    off, raw = 8, None
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        (crc,) = struct.unpack(">I", data[off + 8 + ln : off + 12 + ln])
        assert crc == zlib.crc32(ctype + payload) & 0xFFFFFFFF
        if ctype == b"IDAT":
            raw = zlib.decompress(payload)
        off += 12 + ln
    assert raw == (b"\x00" + bytes([px]) * (w * 3)) * h


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"not an image at all",
        b"BM",  # truncated BMP
        # 26-29-byte BMP claiming a 40-byte info header: the bpp field
        # sits past the buffer — must return None, never struct.error
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + b"\x00" * 9,
        b"\x89PNG\r\n\x1a\nXXXX",  # PNG magic, garbage chunk
        b"\xff\xd8\xff",  # truncated JPEG
        b"GIF89a",  # truncated GIF
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 20,  # magic but not IHDR
    ],
)
def test_malformed_rejected(junk):
    assert parse_image_header(junk) is None


def test_fixture_parse_matches_encode_record():
    """Every committed fixture payload parses back to the dimensions its
    generator recorded — the same invariant the DuckDB oracle checks,
    asserted here directly on the bytes."""
    import pyarrow.parquet as pq

    t = pq.read_table(FIXTURE)
    for d, fmt, payload, w, h, c in zip(
        t["doc_id"].to_pylist(),
        t["fmt"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_width"].to_pylist(),
        t["exp_height"].to_pylist(),
        t["exp_channels"].to_pylist(),
    ):
        assert parse_image_header(payload) == (fmt, w, h, c), d


def test_fixture_generator_is_deterministic():
    """fixture_row re-derives the committed row for a sample of ids."""
    import pyarrow.parquet as pq

    from tools.gen_image_fixture import fixture_row

    t = pq.read_table(FIXTURE).slice(0, 64)
    for d, fmt, payload, w, h, c in zip(
        t["doc_id"].to_pylist(),
        t["fmt"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_width"].to_pylist(),
        t["exp_height"].to_pylist(),
        t["exp_channels"].to_pylist(),
    ):
        assert fixture_row(d) == (fmt, payload, w, h, c)


def test_map_in_pandas_true_dimensions(spark):
    """The registered query returns PARSED dimensions for real payloads
    (not length-derived fakes): spot-check against the fixture record."""
    from parallel_map_reduce_spark.queries.multimodal import (
        multimodal_image_features,
    )

    rows = {
        r.doc_id: r
        for r in multimodal_image_features(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id")
        .limit(8)
        .collect()
    }
    from tools.gen_image_fixture import fixture_row

    for d, r in rows.items():
        fmt, payload, w, h, c = fixture_row(d)
        assert (r.width, r.height, r.channels) == (w, h, c)
        assert r.n_bytes == len(payload)
        assert r.aspect == w / h
