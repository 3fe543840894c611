"""EXIF APP1/TIFF IFD0 codec: build→parse round trips in both byte
orders, unit conversion, malformed-structure degradation, and the
committed-fixture sweep against the generator's encode-time record."""

from __future__ import annotations

import struct

import pytest

from parallel_map_reduce_spark.multimodal.exifmeta import (
    build_exif_app1,
    insert_app1,
    parse_exif,
)
from parallel_map_reduce_spark.multimodal.imagehdr import build_jpeg

FIXTURE = "/root/repo/refdata/image_fixture.parquet"


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_both_byte_orders(bo):
    j = insert_app1(
        build_jpeg(16, 12, 3, pattern=7),
        build_exif_app1(6, 300, 150, "2026:08:16 05:00:00", bo),
    )
    assert parse_exif(j) == {
        "orientation": 6,
        "x_dpi": 300,
        "y_dpi": 150,
        "datetime": "2026:08:16 05:00:00",
    }


def test_cm_resolution_unit_converts_to_dpi():
    """ResolutionUnit=3 (pixels/cm) must convert: 100/cm = 254 dpi."""
    app1 = bytearray(build_exif_app1(1, 100, 100, "2026:01:01 00:00:00", "II"))
    # Patch the ResolutionUnit SHORT from 2 (inch) to 3 (cm): locate
    # the tag 0x0128 entry in the little-endian IFD.
    idx = bytes(app1).find(struct.pack("<HH", 0x0128, 3))
    assert idx > 0
    app1[idx + 8 : idx + 10] = struct.pack("<H", 3)
    got = parse_exif(insert_app1(build_jpeg(8, 8, 1, pattern=1), bytes(app1)))
    assert got["x_dpi"] == got["y_dpi"] == 254


def test_malformed_tiff_degrades_to_none():
    j = build_jpeg(8, 8, 1, pattern=1)
    # APP1 present but TIFF truncated mid-IFD
    good = build_exif_app1(3, 72, 72, "2026:01:01 00:00:00", "II")
    truncated = good[:20]
    payload = truncated[4:]
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    assert parse_exif(insert_app1(j, app1)) is None
    # value offset pointing past the blob
    bad = bytearray(good)
    idx = bytes(bad).find(struct.pack("<HHI", 0x011A, 5, 1))
    bad[idx + 8 : idx + 12] = struct.pack("<I", 10_000)
    assert parse_exif(insert_app1(j, bytes(bad))) is None
    # wrong magic
    assert parse_exif(j) is None
    assert parse_exif(b"\xff\xd8\xff\xd9") is None


def test_fixture_exif_matches_encode_record():
    """Every committed EXIF doc parses back the generator's formulas;
    every non-EXIF doc parses to None; both byte orders occur."""
    import pyarrow.parquet as pq

    t = pq.read_table(FIXTURE)
    n_exif = 0
    orders = set()
    for d, payload, ori, xd, yd, dt in zip(
        t["doc_id"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_orientation"].to_pylist(),
        t["exp_x_dpi"].to_pylist(),
        t["exp_y_dpi"].to_pylist(),
        t["exp_datetime"].to_pylist(),
    ):
        got = parse_exif(payload)
        if ori is None:
            assert got is None, d
        else:
            n_exif += 1
            assert got == {
                "orientation": ori, "x_dpi": xd, "y_dpi": yd, "datetime": dt,
            }, d
            i = payload.find(b"Exif\x00\x00")
            orders.add(bytes(payload[i + 6 : i + 8]))
    assert n_exif == 625  # every other JPEG doc (1250 JPEGs / 2)
    assert orders == {b"II", b"MM"}
