"""Stdlib EXIF (APP1/TIFF IFD0) metadata codec: orientation, DPI, and
capture datetime from JPEG payloads, plus a deterministic fixture
builder.

This is the metadata pass a training pipeline runs BEFORE any pixel
work: EXIF orientation decides whether a decode needs a rotate/flip
(a pipeline that ignores tag 0x0112 trains on sideways images), and
resolution metadata feeds dedup/quality heuristics. The container walk
is pure ``struct``: JPEG APP1 segment → "Exif\\0\\0" → TIFF header
(II/MM byte order, magic 42) → IFD0 entry table. Both byte orders are
real in the wild (II = most cameras, MM = older Apple/scanners) and
both are exercised by the committed fixture.

Parser contract: ``parse_exif(data)`` returns a dict with
``orientation`` (int 1-8), ``x_dpi``/``y_dpi`` (ints; RATIONAL values
reduced, unit-converted from cm when ResolutionUnit=3), and
``datetime`` (the raw "YYYY:MM:DD HH:MM:SS" string) — each key absent
when the tag is absent — or ``None`` when the payload has no
well-formed EXIF APP1. Malformed TIFF structure inside a present APP1
(truncated IFD, out-of-bounds value offsets) returns ``None`` rather
than raising: metadata is advisory, and the decode maps' skip contract
treats an unreadable side-channel like an absent one. Public basis:
the EXIF 2.x / TIFF 6.0 layouts (JEITA CP-3451, Adobe TIFF spec); the
reference repo has no image path (north-star scope).
"""

from __future__ import annotations

import struct

_TAG_ORIENTATION = 0x0112
_TAG_XRES = 0x011A
_TAG_YRES = 0x011B
_TAG_RESUNIT = 0x0128
_TAG_DATETIME = 0x0132

# TIFF field type -> byte width (the ones IFD0 metadata uses).
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _find_app1_exif(data: bytes) -> bytes | None:
    """The APP1 Exif segment's TIFF payload, or None. Walks the JPEG
    marker stream like the header parser: APPn/COM segments carry
    big-endian lengths; the walk stops at SOS (metadata precedes
    entropy data per JFIF/EXIF layout)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no metadata past here
            return None
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        if seglen < 2 or i + 2 + seglen > len(data):
            return None
        if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
            return data[i + 10 : i + 2 + seglen]
        i += 2 + seglen
    return None


def _parse_tiff_ifd0(tiff: bytes) -> dict | None:
    """IFD0 entries of a TIFF blob as {tag: value}; None on malformed
    structure. Values: SHORT/LONG -> int, ASCII -> str (NUL-stripped),
    RATIONAL -> (num, den) tuple."""
    if len(tiff) < 8:
        return None
    if tiff[0:2] == b"II":
        e = "<"
    elif tiff[0:2] == b"MM":
        e = ">"
    else:
        return None
    (magic,) = struct.unpack(e + "H", tiff[2:4])
    if magic != 42:
        return None
    (ifd_off,) = struct.unpack(e + "I", tiff[4:8])
    if ifd_off + 2 > len(tiff):
        return None
    (n_entries,) = struct.unpack(e + "H", tiff[ifd_off : ifd_off + 2])
    out: dict[int, object] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(tiff):
            return None
        tag, ftype, count = struct.unpack(e + "HHI", tiff[off : off + 8])
        size = _TYPE_SIZES.get(ftype)
        if size is None:
            continue  # unknown field type: skip the entry, not the file
        nbytes = size * count
        if nbytes <= 4:
            val_bytes = tiff[off + 8 : off + 8 + nbytes]
        else:
            (voff,) = struct.unpack(e + "I", tiff[off + 8 : off + 12])
            if voff + nbytes > len(tiff):
                return None
            val_bytes = tiff[voff : voff + nbytes]
        if ftype == 3 and count >= 1:  # SHORT
            out[tag] = struct.unpack(e + "H", val_bytes[0:2])[0]
        elif ftype == 4 and count >= 1:  # LONG
            out[tag] = struct.unpack(e + "I", val_bytes[0:4])[0]
        elif ftype == 5 and count >= 1:  # RATIONAL
            num, den = struct.unpack(e + "II", val_bytes[0:8])
            out[tag] = (num, den)
        elif ftype == 2:  # ASCII
            out[tag] = val_bytes.rstrip(b"\x00").decode("ascii", "replace")
    return out


def parse_exif(data: bytes) -> dict | None:
    """EXIF IFD0 metadata for a JPEG payload (see module docstring)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return None
    tiff = _find_app1_exif(bytes(data))
    if tiff is None:
        return None
    tags = _parse_tiff_ifd0(tiff)
    if tags is None:
        return None
    out: dict[str, object] = {}
    ori = tags.get(_TAG_ORIENTATION)
    if isinstance(ori, int) and 1 <= ori <= 8:
        out["orientation"] = ori
    unit = tags.get(_TAG_RESUNIT, 2)  # TIFF default: inch
    for key, tag in (("x_dpi", _TAG_XRES), ("y_dpi", _TAG_YRES)):
        v = tags.get(tag)
        if isinstance(v, tuple) and v[1]:
            dpi = v[0] / v[1]
            if unit == 3:  # pixels/cm -> pixels/inch
                dpi *= 2.54
            out[key] = int(round(dpi))
    dt = tags.get(_TAG_DATETIME)
    if isinstance(dt, str) and dt:
        out["datetime"] = dt
    return out if out else None


def apply_orientation(arr, orientation: int):
    """Upright a (h, w, c) pixel array per EXIF orientation 1-8 — the
    standard mapping (identity / mirror / rot180 / flip / transpose /
    rot90CW / transverse / rot90CCW; what PIL's exif_transpose
    applies). Pure numpy views; callers needing bytes must copy to
    contiguous. Out-of-range codes are treated as 1 (the tag is
    advisory)."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:
        return arr.transpose(1, 0, 2)
    if orientation == 6:  # rotate 90 clockwise
        return arr.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:  # transverse: anti-diagonal flip
        return arr.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:  # rotate 90 counter-clockwise
        return arr.transpose(1, 0, 2)[::-1]
    return arr


def build_exif_app1(
    orientation: int,
    x_dpi: int,
    y_dpi: int,
    datetime_str: str,
    byte_order: str = "II",
) -> bytes:
    """A complete APP1 Exif segment (marker + length + Exif header +
    TIFF blob) carrying IFD0 tags orientation / XResolution /
    YResolution / ResolutionUnit(inch) / DateTime — in either byte
    order. RATIONAL and ASCII values land past the entry table exactly
    as the spec lays them out."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    e = "<" if byte_order == "II" else ">"
    dt = datetime_str.encode("ascii") + b"\x00"
    entries = [
        (_TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation) + b"\x00\x00"),
        (_TAG_XRES, 5, 1, ("off", struct.pack(e + "II", x_dpi, 1))),
        (_TAG_YRES, 5, 1, ("off", struct.pack(e + "II", y_dpi, 1))),
        (_TAG_RESUNIT, 3, 1, struct.pack(e + "H", 2) + b"\x00\x00"),
        (_TAG_DATETIME, 2, len(dt), ("off", dt)),
    ]
    entries.sort()  # TIFF requires ascending tag order
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4  # header + count + entries + next-IFD ptr
    table = struct.pack(e + "H", n)
    tail = b""
    for tag, ftype, count, val in entries:
        table += struct.pack(e + "HHI", tag, ftype, count)
        if isinstance(val, tuple):
            table += struct.pack(e + "I", data_off + len(tail))
            tail += val[1]
        else:
            table += val
    table += struct.pack(e + "I", 0)  # no IFD1
    tiff = (
        byte_order.encode() + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
        + table + tail
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """``jpeg`` with ``app1`` inserted immediately after SOI — the
    canonical EXIF position (before JFIF APP0 is tolerated by every
    reader, including this module's own walk)."""
    if jpeg[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[0:2] + app1 + jpeg[2:]
