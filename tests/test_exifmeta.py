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
    every non-EXIF doc parses to None; both byte orders occur; ALL
    EIGHT orientations occur (advisor r13: the old ``doc_id % 8``
    cadence aliased with the mod-8 EXIF selection and planted
    orientation 4 on every doc, never exercising the transpose path)
    and the dim-swapping codes 5-8 record swapped oriented output
    dims in the encode-time expectation columns."""
    import pyarrow.parquet as pq

    t = pq.read_table(FIXTURE)
    n_exif = 0
    orders = set()
    orientations = set()
    for d, payload, ori, xd, yd, dt, ow, oh, oow, ooh in zip(
        t["doc_id"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_orientation"].to_pylist(),
        t["exp_x_dpi"].to_pylist(),
        t["exp_y_dpi"].to_pylist(),
        t["exp_datetime"].to_pylist(),
        t["exp_out_width"].to_pylist(),
        t["exp_out_height"].to_pylist(),
        t["exp_oriented_out_width"].to_pylist(),
        t["exp_oriented_out_height"].to_pylist(),
    ):
        got = parse_exif(payload)
        if ori is None:
            assert got is None, d
            assert (oow, ooh) == (ow, oh), d  # no EXIF -> upright as-is
        else:
            n_exif += 1
            orientations.add(ori)
            assert got == {
                "orientation": ori, "x_dpi": xd, "y_dpi": yd, "datetime": dt,
            }, d
            i = payload.find(b"Exif\x00\x00")
            orders.add(bytes(payload[i + 6 : i + 8]))
            if ori >= 5:
                # transpose family: the oriented image is (w, h), so
                # the fit-to-256 output dims swap vs the upright resize
                assert (oow, ooh) == (oh, ow), (d, ori)
            else:
                assert (oow, ooh) == (ow, oh), (d, ori)
    assert n_exif == 625  # every other JPEG doc (1250 JPEGs / 2)
    assert orders == {b"II", b"MM"}
    assert orientations == set(range(1, 9))


def test_apply_orientation_mapping():
    """Pin the 1-8 upright mapping on an asymmetric array: dims swap
    for 5-8, corner tracking per the EXIF convention, and each
    transform undoes per its standard inverse (6 and 8 are mutual
    inverses; 1-5 and 7 are involutions)."""
    import numpy as np

    from parallel_map_reduce_spark.multimodal.exifmeta import apply_orientation

    a = np.arange(2 * 3 * 1, dtype=np.uint8).reshape(2, 3, 1)
    # visual top-left of the upright image per orientation code
    assert apply_orientation(a, 1)[0, 0, 0] == 0
    assert apply_orientation(a, 2)[0, 0, 0] == 2  # mirrored
    assert apply_orientation(a, 3)[0, 0, 0] == 5  # rot180
    assert apply_orientation(a, 4)[0, 0, 0] == 3  # flipped
    for ori in (5, 6, 7, 8):
        t = apply_orientation(a, ori)
        assert t.shape == (3, 2, 1), ori
    # rotate 90 CW: old bottom-left becomes new top-left
    assert apply_orientation(a, 6)[0, 0, 0] == 3
    # rotate 90 CCW: old top-right becomes new top-left
    assert apply_orientation(a, 8)[0, 0, 0] == 2
    inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    for ori, io in inv.items():
        back = apply_orientation(apply_orientation(a, ori), io)
        assert (back == a).all(), ori


def test_oriented_resize_map_swaps_dims_and_defaults_upright():
    """The Arrow body: an orientation-6 payload resizes with swapped
    output dims; an EXIF-less payload behaves exactly like the plain
    resize path."""
    import pandas as pd
    import zlib as _zlib

    import numpy as np

    from parallel_map_reduce_spark.multimodal.codec import (
        oriented_resize_map,
        resize_map,
    )

    plain = build_jpeg(32, 16, 3, pattern=9)
    rotated = insert_app1(
        plain, build_exif_app1(6, 72, 72, "2026:01:01 00:00:00", "II")
    )
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [plain, rotated]})
    (out,) = list(oriented_resize_map(iter([pdf])))
    (base,) = list(resize_map(iter([pdf.iloc[:1]])))
    r1 = out[out.doc_id == 1].iloc[0]
    r2 = out[out.doc_id == 2].iloc[0]
    # EXIF-less: same out dims + checksum as the plain path
    assert (r1.out_width, r1.out_height, r1.resized_crc32) == (
        base.iloc[0].out_width, base.iloc[0].out_height,
        base.iloc[0].resized_crc32,
    )
    assert r1.orientation == 1
    # rotated 90CW: dims swap relative to the plain resize
    assert (r2.out_width, r2.out_height) == (r1.out_height, r1.out_width)
    assert r2.orientation == 6 and r2.resized_crc32 != r1.resized_crc32
