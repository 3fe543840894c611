"""Generate the committed binary image fixture (refdata/image_fixture.parquet).

One row per doc_id 0..4999 (covers every driver sf: documents doc_ids
are 0..499 at sf0.001/sf0.01 and 0..4999 at sf0.1), with REAL image
bytes built by the stdlib builders in multimodal/imagehdr.py and the
encode-time record as expected-value columns:

    doc_id BIGINT, fmt VARCHAR, payload BLOB,
    exp_width BIGINT, exp_height BIGINT, exp_channels BIGINT,
    exp_out_width BIGINT, exp_out_height BIGINT, exp_resized_crc32 BIGINT,
    exp_orientation BIGINT, exp_x_dpi BIGINT, exp_y_dpi BIGINT,
    exp_datetime VARCHAR   (NULL on docs without EXIF)

PNG/GIF/BMP payloads carry the deterministic ``pattern_byte`` pixel
ramp (PNG rows cycle through all five filter types); JPEG payloads
are REAL Huffman-coded files of DC-only blocks whose flat value is
``jpeg_block_value`` per 8x8 block (exact by construction: dc*q
divisible by 8, so any correct IDCT lands on the integer), mixing
baseline SOF0 (4:4:4 and 4:2:0) and progressive SOF2 frames. The
exp_out_*/exp_resized_crc32 columns record what a correct decode +
fit-to-256 nearest-neighbor resize must produce — computed HERE from
the pattern FORMULAS alone (this script never decodes a payload; the
fit/resample arithmetic is reimplemented inline rather than imported
from pixeldec.py), so the parity check pits the Spark decode path
against an independent derivation.

Deterministic by construction (no RNG, no time): re-running this
script reproduces the identical parquet content.

Usage: python tools/gen_image_fixture.py
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_spark.multimodal.exifmeta import (  # noqa: E402
    build_exif_app1,
    insert_app1,
)
from parallel_map_reduce_spark.multimodal.imagehdr import (  # noqa: E402
    bmp_palette_index,
    build_bmp,
    build_bmp_palette,
    build_gif,
    build_jpeg,
    build_png,
    build_png_variant,
    parse_image_header,
    png_palette_entry,
    png_palette_index,
)

N_DOCS = 5000
RESIZE_TARGET = 256
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "image_fixture.parquet",
)


def png_variant(doc_id: int) -> tuple[str, int]:
    """(variant, depth) for a PNG doc: every fifth is 4-bit PALETTE,
    every fifth 16-BIT (gray/rgb/rgba per the channel rotation), every
    fifth 2-bit grayscale; the rest stay the 8-bit all-filter form."""
    v = (doc_id // 4) % 5
    if v == 0:
        return "palette", 4
    if v == 1:
        return "depth16", 16
    if v == 2:
        return "gray_lowdepth", 2
    return "standard", 8


def fixture_row(doc_id: int) -> tuple[str, bytes, int, int, int]:
    """Deterministic (fmt, payload, width, height, channels) for one doc."""
    width = (doc_id % 48) + 8
    height = ((doc_id * 7) % 36) + 8
    fmt = ("png", "gif", "bmp", "jpeg")[doc_id % 4]
    if fmt == "png":
        channels = (1, 3, 4)[doc_id % 3]
        variant, depth = png_variant(doc_id)
        if variant == "palette":
            channels = 3  # indices dereference to RGB
            payload = build_png_variant(width, height, doc_id % 256, depth, "palette")
        elif variant == "depth16":
            color = {1: "gray", 3: "rgb", 4: "rgba"}[channels]
            payload = build_png_variant(width, height, doc_id % 256, 16, color)
        elif variant == "gray_lowdepth":
            channels = 1
            payload = build_png_variant(width, height, doc_id % 256, depth, "gray")
        else:
            payload = build_png(width, height, channels, pattern=doc_id % 256)
    elif fmt == "gif":
        channels = 3
        payload = build_gif(width, height, pattern=doc_id % 256)
    elif fmt == "bmp":
        channels = 3
        # Rotate the BMP docs through the wild variants: 8-bit palette
        # (uncompressed), BI_RLE8 run-length coded, and the 24-bit form.
        v = (doc_id // 4) % 3
        if v == 0:
            payload = build_bmp_palette(width, height, doc_id % 256, rle=False)
        elif v == 1:
            payload = build_bmp_palette(width, height, doc_id % 256, rle=True)
        else:
            payload = build_bmp(width, height, pattern=doc_id % 256)
    else:
        channels = 1 if doc_id % 5 == 0 else 3
        # Real coverage of the decoder's frame types: every third JPEG
        # doc is PROGRESSIVE (SOF2, successive approximation), and a
        # third of the color ones are 4:2:0 subsampled. The expected-
        # pixel formula is identical across all variants (DC-only
        # blocks; jpeg_block_value is keyed on GLOBAL block coords).
        progressive = doc_id % 3 == 0
        sub = "420" if (channels == 3 and doc_id % 3 == 1) else "444"
        payload = build_jpeg(
            width, height, channels, pattern=doc_id % 256,
            subsampling=sub, progressive=progressive,
        )
        # EXIF on every other JPEG doc (r13): orientation/DPI/datetime
        # derived from doc_id formulas, byte order alternating II/MM so
        # both real-world layouts are in the committed fixture. The
        # APP1 segment changes bytes, not pixels, so every other exp_*
        # column is untouched.
        if has_exif(doc_id):
            payload = insert_app1(payload, build_exif_app1(
                *exif_values(doc_id), byte_order="II" if (doc_id // 8) % 2 else "MM",
            ))
    return fmt, payload, width, height, channels


def has_exif(doc_id: int) -> bool:
    """Every other JPEG doc (JPEG doc_ids are all % 4 == 3, so the
    alternation must ride doc_id // 4, not parity)."""
    return (doc_id // 4) % 2 == 0


def exif_values(doc_id: int) -> tuple[int, int, int, str]:
    """(orientation, x_dpi, y_dpi, datetime) formulas for EXIF docs.

    Orientation rides ``doc_id // 8``: EXIF docs are exactly
    doc_id ≡ 3 (mod 8) (JPEG = %4==3 intersected with has_exif's
    //4 alternation), so a plain ``doc_id % 8`` is CONSTANT over them
    (always 3 → orientation 4 — advisor r13: the committed fixture
    never exercised the dim-swapping transpose path). ``// 8`` strides
    once per EXIF doc, cycling all eight orientations 1-8."""
    return (
        (doc_id // 8) % 8 + 1,
        72 + doc_id % 229,
        72 + (doc_id * 3) % 229,
        f"2026:08:{doc_id % 28 + 1:02d} {doc_id % 24:02d}:00:00",
    )


def expected_pixels(
    fmt: str, w: int, h: int, c: int, base: int, doc_id: int | None = None
) -> np.ndarray:
    """The pattern image as an (h, w, c) array — straight from the
    encode formulas, no payload bytes involved. PNG depth variants:
    palette pixels come from the palette/index formulas, low-depth
    grayscale from the quantize-then-rescale arithmetic, and 16-bit
    from the unchanged ramp (a correct decode takes the high byte,
    which IS pattern_byte)."""
    if fmt == "png" and doc_id is not None:
        variant, depth = png_variant(doc_id)
        if variant == "palette":
            img = np.empty((h, w, 3), np.uint8)
            for y in range(h):
                for x in range(w):
                    i = png_palette_index(x, y, base, depth)
                    for ch in range(3):
                        img[y, x, ch] = png_palette_entry(i, ch, base)
            return img
        if variant == "gray_lowdepth":
            xs = np.arange(w)[None, :]
            ys = np.arange(h)[:, None]
            ramp = (base + 3 * xs + 5 * ys) % 256
            lev = ramp >> (8 - depth)
            return (lev * 255 // ((1 << depth) - 1)).astype(np.uint8)[:, :, None]
        # depth16 and standard share the plain ramp below
    if fmt == "bmp" and doc_id is not None and (doc_id // 4) % 3 != 2:
        rle = (doc_id // 4) % 3 == 1
        img = np.empty((h, w, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                i = bmp_palette_index(x, y, base, rle)
                for ch in range(3):
                    img[y, x, ch] = png_palette_entry(i, ch, base)
        return img
    if fmt == "gif":
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        cell = (((xs + ys + base) % 2) * 255).astype(np.uint8)
        return np.repeat(cell[:, :, None], 3, axis=2)
    if fmt == "jpeg":
        # Flat per-8x8-block values (imagehdr.py:jpeg_block_value):
        # 128 + 2*(((base + 3*bx + 5*by) % 128) - 64), all channels.
        bxs = (np.arange(w) // 8)[None, :]
        bys = (np.arange(h) // 8)[:, None]
        cell = (128 + 2 * (((base + 3 * bxs + 5 * bys) % 128) - 64)).astype(np.uint8)
        return np.repeat(cell[:, :, None], c, axis=2)
    xs = np.arange(w)[None, :, None]
    ys = np.arange(h)[:, None, None]
    cs = np.arange(c)[None, None, :]
    return ((base + 3 * xs + 5 * ys + 17 * cs) % 256).astype(np.uint8)


def expected_resize(
    fmt: str, w: int, h: int, c: int, base: int, doc_id: int | None = None
):
    """(out_w, out_h, crc32) a correct decode+resize must produce —
    the fit and nearest-neighbor mapping restated inline."""
    long_edge = max(w, h)
    out_w = max(1, w * RESIZE_TARGET // long_edge)
    out_h = max(1, h * RESIZE_TARGET // long_edge)
    img = expected_pixels(fmt, w, h, c, base, doc_id)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    resized = img[ys][:, xs]
    return out_w, out_h, zlib.crc32(resized.tobytes()) & 0xFFFFFFFF


def _orient(img: np.ndarray, orientation: int) -> np.ndarray:
    """The EXIF 1-8 upright mapping, restated inline (the generator
    never imports decode-side code): mirror / rot180 / flip /
    transpose / rot90CW / transverse / rot90CCW."""
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1]
    if orientation == 5:
        return img.transpose(1, 0, 2)
    if orientation == 6:
        return img.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:
        return img.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return img.transpose(1, 0, 2)[::-1]
    return img


def expected_oriented_resize(
    fmt: str, w: int, h: int, c: int, base: int, doc_id: int
):
    """(out_w, out_h, crc32) after the EXIF-upright transform: the
    formula pixels oriented per the doc's planted orientation (1 when
    the doc carries no EXIF), then the same fit + nearest mapping."""
    ori = exif_values(doc_id)[0] if (fmt == "jpeg" and has_exif(doc_id)) else 1
    img = np.ascontiguousarray(
        _orient(expected_pixels(fmt, w, h, c, base, doc_id), ori)
    )
    oh, ow = img.shape[0], img.shape[1]
    long_edge = max(ow, oh)
    out_w = max(1, ow * RESIZE_TARGET // long_edge)
    out_h = max(1, oh * RESIZE_TARGET // long_edge)
    ys = (np.arange(out_h) * oh) // out_h
    xs = (np.arange(out_w) * ow) // out_w
    resized = img[ys][:, xs]
    return ori, out_w, out_h, zlib.crc32(resized.tobytes()) & 0xFFFFFFFF


def main() -> int:
    cols = (
        "doc_id", "fmt", "payload", "exp_width", "exp_height",
        "exp_channels", "exp_out_width", "exp_out_height",
        "exp_resized_crc32", "exp_orientation", "exp_x_dpi",
        "exp_y_dpi", "exp_datetime", "exp_eff_orientation",
        "exp_oriented_out_width", "exp_oriented_out_height",
        "exp_oriented_crc32",
    )
    rows: dict[str, list] = {k: [] for k in cols}
    for d in range(N_DOCS):
        fmt, payload, w, h, c = fixture_row(d)
        # Self-check: the parser must read back exactly what was encoded.
        parsed = parse_image_header(payload)
        assert parsed == (fmt, w, h, c), (d, parsed, (fmt, w, h, c))
        ow, oh, crc = expected_resize(fmt, w, h, c, d % 256, d)
        rows["doc_id"].append(d)
        rows["fmt"].append(fmt)
        rows["payload"].append(payload)
        rows["exp_width"].append(w)
        rows["exp_height"].append(h)
        rows["exp_channels"].append(c)
        rows["exp_out_width"].append(ow)
        rows["exp_out_height"].append(oh)
        rows["exp_resized_crc32"].append(crc)
        eori, oow, ooh, ocrc = expected_oriented_resize(fmt, w, h, c, d % 256, d)
        rows["exp_eff_orientation"].append(eori)
        rows["exp_oriented_out_width"].append(oow)
        rows["exp_oriented_out_height"].append(ooh)
        rows["exp_oriented_crc32"].append(ocrc)
        if fmt == "jpeg" and has_exif(d):
            ori, xd, yd, dt = exif_values(d)
            rows["exp_orientation"].append(ori)
            rows["exp_x_dpi"].append(xd)
            rows["exp_y_dpi"].append(yd)
            rows["exp_datetime"].append(dt)
        else:
            rows["exp_orientation"].append(None)
            rows["exp_x_dpi"].append(None)
            rows["exp_y_dpi"].append(None)
            rows["exp_datetime"].append(None)
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "exp_width": pa.array(rows["exp_width"], pa.int64()),
            "exp_height": pa.array(rows["exp_height"], pa.int64()),
            "exp_channels": pa.array(rows["exp_channels"], pa.int64()),
            "exp_out_width": pa.array(rows["exp_out_width"], pa.int64()),
            "exp_out_height": pa.array(rows["exp_out_height"], pa.int64()),
            "exp_resized_crc32": pa.array(rows["exp_resized_crc32"], pa.int64()),
            "exp_orientation": pa.array(rows["exp_orientation"], pa.int64()),
            "exp_x_dpi": pa.array(rows["exp_x_dpi"], pa.int64()),
            "exp_y_dpi": pa.array(rows["exp_y_dpi"], pa.int64()),
            "exp_datetime": pa.array(rows["exp_datetime"], pa.string()),
            "exp_eff_orientation": pa.array(rows["exp_eff_orientation"], pa.int64()),
            "exp_oriented_out_width": pa.array(rows["exp_oriented_out_width"], pa.int64()),
            "exp_oriented_out_height": pa.array(rows["exp_oriented_out_height"], pa.int64()),
            "exp_oriented_crc32": pa.array(rows["exp_oriented_crc32"], pa.int64()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows, {os.path.getsize(OUT)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
