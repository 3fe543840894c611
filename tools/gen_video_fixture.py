"""Generate the committed AVI video fixture (refdata/video_fixture.parquet)
and its sampled-frame expectation table
(refdata/video_frames_expected.parquet).

One real AVI per doc_id 0..4999 (covers every driver sf), built by
multimodal/videohdr.py — RIFF container, LIST hdrl/movi. Codecs mix
deterministically: doc_id % 4 == 3 gets MOTION-JPEG ('00dc' chunks of
complete Huffman-coded baseline JPEGs, imagehdr.build_jpeg), everything
else uncompressed 24-bit DIB pattern frames:

    video_fixture.parquet:
        doc_id BIGINT, payload BLOB, exp_codec VARCHAR, exp_width BIGINT,
        exp_height BIGINT, exp_n_frames BIGINT, exp_usec_per_frame BIGINT
    video_frames_expected.parquet (every SAMPLE_EVERY-th frame):
        doc_id BIGINT, frame_idx BIGINT, byte_offset BIGINT,
        frame_crc32 BIGINT

``byte_offset`` comes from the builder's own serialization arithmetic
(build_avi returns it while writing — never by re-parsing), and
``frame_crc32`` is the CRC-32 of the frame's decoded RGB pixels
computed HERE from the pattern FORMULAS (DIB: the position ramp;
MJPEG: the flat-per-8x8-block JPEG value — this script never walks a
payload's chunk tree and never runs a JPEG decoder). The Spark side of ``multimodal_video_frames``
must parse the actual RIFF structure and pixel-decode the DIB frames
to reproduce both. Deterministic: no RNG, no time.

Usage: python tools/gen_video_fixture.py
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_spark.multimodal.videohdr import build_avi  # noqa: E402

N_DOCS = 5000
SAMPLE_EVERY = 3
WIDTHS = (4, 6, 8)
HEIGHTS = (3, 4, 5)
USECS = (33333, 40000, 20000)
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "refdata")
OUT_VIDEO = os.path.join(OUT_DIR, "video_fixture.parquet")
OUT_FRAMES = os.path.join(OUT_DIR, "video_frames_expected.parquet")


def fixture_params(doc_id: int) -> tuple[int, int, int, int, int, str]:
    """Deterministic (width, height, n_frames, usec_per_frame, base,
    codec) — every fourth doc is motion-JPEG, the rest uncompressed
    DIB."""
    return (
        WIDTHS[doc_id % 3],
        HEIGHTS[(doc_id // 3) % 3],
        (doc_id % 6) + 3,
        USECS[doc_id % 3],
        doc_id % 256,
        "mjpg" if doc_id % 4 == 3 else "dib",
    )


def expected_frame_crc(
    w: int, h: int, frame_idx: int, base: int, codec: str
) -> int:
    """CRC-32 of the frame's decoded RGB pixels, from the pattern
    formulas alone (videohdr.py keys frame f at base + 29*f). DIB: the
    position ramp. MJPEG: the encoder writes DC-only blocks whose exact
    decode is the flat value 128 + 2*(((fbase + 3*bx + 5*by) % 128) -
    64) on all three channels (imagehdr.py:jpeg_block_value — the same
    block arithmetic the image fixture's JPEG expectations use)."""
    fbase = (base + 29 * frame_idx) % 256
    if codec == "mjpg":
        bxs = (np.arange(w) // 8)[None, :]
        bys = (np.arange(h) // 8)[:, None]
        cell = (128 + 2 * (((fbase + 3 * bxs + 5 * bys) % 128) - 64)).astype(
            np.uint8
        )
        img = np.repeat(cell[:, :, None], 3, axis=2)
        return zlib.crc32(img.tobytes()) & 0xFFFFFFFF
    xs = np.arange(w)[None, :, None]
    ys = np.arange(h)[:, None, None]
    cs = np.arange(3)[None, None, :]
    img = ((fbase + 3 * xs + 5 * ys + 17 * cs) % 256).astype(np.uint8)
    return zlib.crc32(img.tobytes()) & 0xFFFFFFFF


def main() -> int:
    vid: dict[str, list] = {
        k: []
        for k in ("doc_id", "payload", "exp_codec", "exp_width", "exp_height", "exp_n_frames", "exp_usec_per_frame")
    }
    frames: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "byte_offset", "frame_crc32")}
    for d in range(N_DOCS):
        w, h, nf, usec, base, codec = fixture_params(d)
        payload, offsets = build_avi(w, h, nf, usec, base, codec=codec)
        vid["doc_id"].append(d)
        vid["payload"].append(payload)
        vid["exp_codec"].append(codec)
        vid["exp_width"].append(w)
        vid["exp_height"].append(h)
        vid["exp_n_frames"].append(nf)
        vid["exp_usec_per_frame"].append(usec)
        for f in range(0, nf, SAMPLE_EVERY):
            frames["doc_id"].append(d)
            frames["frame_idx"].append(f)
            frames["byte_offset"].append(offsets[f])
            frames["frame_crc32"].append(expected_frame_crc(w, h, f, base, codec))
    vt = pa.table(
        {
            "doc_id": pa.array(vid["doc_id"], pa.int64()),
            "payload": pa.array(vid["payload"], pa.binary()),
            "exp_codec": pa.array(vid["exp_codec"], pa.string()),
            "exp_width": pa.array(vid["exp_width"], pa.int64()),
            "exp_height": pa.array(vid["exp_height"], pa.int64()),
            "exp_n_frames": pa.array(vid["exp_n_frames"], pa.int64()),
            "exp_usec_per_frame": pa.array(vid["exp_usec_per_frame"], pa.int64()),
        }
    )
    ft = pa.table({k: pa.array(v, pa.int64()) for k, v in frames.items()})
    pq.write_table(vt, OUT_VIDEO, compression="zstd")
    pq.write_table(ft, OUT_FRAMES, compression="zstd")
    print(f"wrote {OUT_VIDEO}: {vt.num_rows} rows, {os.path.getsize(OUT_VIDEO)} bytes")
    print(f"wrote {OUT_FRAMES}: {ft.num_rows} rows, {os.path.getsize(OUT_FRAMES)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
