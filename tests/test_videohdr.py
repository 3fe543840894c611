"""Stdlib AVI codec: hand-assembled chunk-tree parse (spec check),
build→parse round trips with offset agreement, malformed rejection,
frame pixel decode vs the pattern formula, fixture self-consistency,
and the Spark path reproducing the generator's sampled-frame table.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from parallel_map_reduce_spark.multimodal.imagehdr import pattern_byte
from parallel_map_reduce_spark.multimodal.videohdr import (
    build_avi,
    build_frame,
    decode_frame_pixels,
    parse_avi,
)

FIXTURE = "/root/repo/refdata/video_fixture.parquet"
FRAMES_EXPECTED = "/root/repo/refdata/video_frames_expected.parquet"


@pytest.mark.parametrize(
    ("w", "h", "nf", "usec", "base"),
    [(4, 3, 3, 33333, 0), (8, 5, 8, 40000, 77), (6, 4, 5, 20000, 250)],
)
def test_build_parse_roundtrip(w, h, nf, usec, base):
    payload, offsets = build_avi(w, h, nf, usec, base)
    pw, ph, pusec, frames = parse_avi(payload)
    assert (pw, ph, pusec) == (w, h, usec)
    assert [off for off, _, _ in frames] == offsets
    for f, (off, size, _compressed) in enumerate(frames):
        assert payload[off : off + size] == build_frame(w, h, f, base)


def test_hand_built_avi_chunk_walk():
    """An AVI assembled BY HAND (not via build_avi), with a JUNK chunk
    between hdrl and movi and an extra non-video chunk inside movi —
    the parser must walk sizes, not assume the builder's layout."""
    w, h, usec = 2, 2, 50000
    frame = bytes(range(16))  # 2 rows * stride 8
    avih = struct.pack("<IIIIIIIIII4I", usec, 0, 0, 0, 2, 0, 1, 0, w, h, 0, 0, 0, 0)
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"  # even size, no pad
    pieces = bytearray(b"movi")
    pieces += b"01wb" + struct.pack("<I", 4) + b"\x00" * 4  # audio chunk: skip
    pieces += b"00db" + struct.pack("<I", len(frame)) + frame
    pieces += b"00dc" + struct.pack("<I", len(frame)) + frame
    movi = b"LIST" + struct.pack("<I", len(pieces)) + bytes(pieces)
    body = b"AVI " + hdrl + junk + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    pw, ph, pusec, frames = parse_avi(payload)
    assert (pw, ph, pusec) == (w, h, usec)
    # Frame offsets: just past each video chunk header (tags unique here).
    assert frames == [
        (payload.index(b"00db") + 8, 16, False),
        (payload.index(b"00dc") + 8, 16, True),
    ]
    for off, size, _compressed in frames:
        assert payload[off : off + size] == frame


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WAVE",  # RIFF but not AVI
        b"RIFF" + struct.pack("<I", 4) + b"AVI ",  # AVI with no chunks
        b"not a video",
        # LIST size field lies past the buffer: the subchunk walk must
        # return None, never raise (advisor-class truncation repro)
        b"RIFF" + struct.pack("<I", 1000) + b"AVI "
        + b"LIST" + struct.pack("<I", 1000) + b"movi"
        + b"00db" + struct.pack("<I", 8),
    ],
)
def test_malformed_rejected(junk):
    assert parse_avi(junk) is None


def test_second_video_stream_chunks_excluded():
    """'01db' chunks (a second video stream) must not pollute the
    stream-0 frame list the avih geometry describes."""
    w, h, usec = 2, 2, 40000
    frame = bytes(16)
    avih = struct.pack("<IIIIIIIIII4I", usec, 0, 0, 0, 1, 0, 2, 0, w, h, 0, 0, 0, 0)
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    pieces = bytearray(b"movi")
    pieces += b"00db" + struct.pack("<I", len(frame)) + frame
    pieces += b"01db" + struct.pack("<I", len(frame)) + frame  # other stream
    movi = b"LIST" + struct.pack("<I", len(pieces)) + bytes(pieces)
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _, _, _, frames = parse_avi(payload)
    assert len(frames) == 1
    assert payload[frames[0][0] - 8 : frames[0][0] - 4] == b"00db"


def test_frame_pixel_decode_matches_pattern():
    w, h, base = 6, 4, 42
    for f in range(3):
        rgb = decode_frame_pixels(build_frame(w, h, f, base), w, h)
        got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        fbase = (base + 29 * f) % 256
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    assert got[y, x, c] == pattern_byte(x, y, c, fbase)


def test_truncated_frame_raises():
    with pytest.raises(ValueError):
        decode_frame_pixels(b"\x00" * 10, 4, 4)


def test_fixture_parse_matches_encode_record():
    """Every committed AVI parses to its generator-recorded geometry,
    and every sampled frame's offset + decoded-pixel CRC agrees with
    the expectation table (offsets from serialization arithmetic, CRCs
    from the pattern formula)."""
    import pyarrow.parquet as pq

    t = pq.read_table(FIXTURE)
    ft = pq.read_table(FRAMES_EXPECTED)
    exp = {
        (d, fi): (off, crc)
        for d, fi, off, crc in zip(
            ft["doc_id"].to_pylist(),
            ft["frame_idx"].to_pylist(),
            ft["byte_offset"].to_pylist(),
            ft["frame_crc32"].to_pylist(),
        )
    }
    n_frames_checked = 0
    cols = ("doc_id", "payload", "exp_width", "exp_height", "exp_n_frames", "exp_usec_per_frame")
    for d, payload, w, h, nf, usec in zip(*[t[c].to_pylist() for c in cols]):
        pw, ph, pusec, frames = parse_avi(payload)
        assert (pw, ph, pusec, len(frames)) == (w, h, usec, nf), d
        for fi in range(0, nf, 3):
            off, size, _compressed = frames[fi]
            rgb = decode_frame_pixels(payload[off : off + size], pw, ph)
            assert exp[(d, fi)] == (off, zlib.crc32(rgb) & 0xFFFFFFFF), (d, fi)
            n_frames_checked += 1
    assert n_frames_checked == ft.num_rows


def test_fixture_generator_is_deterministic():
    import pyarrow.parquet as pq

    from tools.gen_video_fixture import fixture_params

    from parallel_map_reduce_spark.multimodal.videohdr import build_avi as _build

    t = pq.read_table(FIXTURE).slice(0, 48)
    cols = ("doc_id", "payload", "exp_codec", "exp_width", "exp_height", "exp_n_frames", "exp_usec_per_frame")
    for d, payload, codec, w, h, nf, usec in zip(*[t[c].to_pylist() for c in cols]):
        pw, ph, pnf, pusec, base, pcodec = fixture_params(d)
        assert (pw, ph, pnf, pusec, pcodec) == (w, h, nf, usec, codec)
        assert _build(pw, ph, pnf, pusec, base, codec=pcodec)[0] == payload, d


def test_frames_map_skips_truncated_frames():
    """A parseable container whose sampled frame bytes are short must
    SKIP that frame row, not crash the batch."""
    import pandas as pd

    from parallel_map_reduce_spark.multimodal.codec import video_frames_map

    payload, offsets = build_avi(4, 3, 4, 40000, 7)
    truncated = payload[: offsets[3] + 4]  # cut inside the 4th frame
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [payload, truncated]})
    (out,) = list(video_frames_map(iter([pdf])))
    # doc 1: frames 0 and 3 sampled; doc 2: frame 0 survives, frame 3 cut
    assert out[out.doc_id == 1]["frame_idx"].tolist() == [0, 3]
    assert out[out.doc_id == 2]["frame_idx"].tolist() == [0]


def test_map_in_pandas_video_metadata(spark):
    """multimodal_video_features parses true geometry/timing from the
    container — spot-checked against the fixture's encode record."""
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.queries.multimodal import (
        multimodal_video_features,
    )

    rows = {
        r.doc_id: r
        for r in multimodal_video_features(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id")
        .limit(12)
        .collect()
    }
    t = pq.read_table(FIXTURE).slice(0, 12)
    cols = ("doc_id", "payload", "exp_width", "exp_height", "exp_n_frames", "exp_usec_per_frame")
    for d, payload, w, h, nf, usec in zip(*[t[c].to_pylist() for c in cols]):
        r = rows[d]
        assert (r.width, r.height, r.n_frames, r.usec_per_frame) == (w, h, nf, usec)
        assert r.n_bytes == len(payload)
        assert r.duration_s == nf * usec / 1_000_000.0


def test_map_in_pandas_real_frame_sampling(spark):
    """The registered query equals the generator's expectation table
    exactly at sf0.001 (full-result comparison, all 500 docs)."""
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.queries.multimodal import (
        multimodal_video_frames,
    )

    got = sorted(
        (r.doc_id, r.frame_idx, r.byte_offset, r.frame_crc32)
        for r in multimodal_video_frames(spark, "/root/testdata/sf0.001").collect()
    )
    ft = pq.read_table(FRAMES_EXPECTED)
    exp = sorted(
        (d, fi, off, crc)
        for d, fi, off, crc in zip(
            ft["doc_id"].to_pylist(),
            ft["frame_idx"].to_pylist(),
            ft["byte_offset"].to_pylist(),
            ft["frame_crc32"].to_pylist(),
        )
        if d < 500
    )
    assert got == exp


def test_mjpeg_roundtrip_matches_block_formula():
    """MJPEG AVIs ('00dc' chunks of complete Huffman-coded baseline
    JPEGs): parse the container, decode every frame through the real
    JPEG decoder, and match the encoder's DC-only block arithmetic —
    decoded pixels are exactly 128 + 2*(((fbase + 3*bx + 5*by) % 128)
    - 64) on all channels (the image fixture's JPEG exactness
    contract), fbase keyed at base + 29*frame_idx."""
    import numpy as np

    for (w, h, nf, usec, base) in [(4, 3, 5, 33333, 7), (8, 5, 3, 20000, 200)]:
        payload, offsets = build_avi(w, h, nf, usec, base, codec="mjpg")
        pw, ph, pusec, frames = parse_avi(payload)
        assert (pw, ph, pusec, len(frames)) == (w, h, usec, nf)
        assert [f[0] for f in frames] == offsets
        for fi, (off, size, _compressed) in enumerate(frames):
            assert payload[off : off + 2] == b"\xff\xd8"  # real JPEG
            rgb = decode_frame_pixels(payload[off : off + size], w, h)
            fbase = (base + 29 * fi) % 256
            bxs = (np.arange(w) // 8)[None, :]
            bys = (np.arange(h) // 8)[:, None]
            cell = (128 + 2 * (((fbase + 3 * bxs + 5 * bys) % 128) - 64)).astype(
                np.uint8
            )
            exp = np.repeat(cell[:, :, None], 3, axis=2)
            assert rgb == exp.tobytes(), (w, h, fi)


def test_mjpeg_frame_dim_mismatch_raises():
    """An MJPEG frame whose JPEG dims disagree with the container
    header must raise (a corrupt mux), never silently pass wrong-sized
    pixels downstream."""
    from parallel_map_reduce_spark.multimodal.imagehdr import build_jpeg

    frame = build_jpeg(6, 6, 3, pattern=5)
    with pytest.raises(ValueError):
        decode_frame_pixels(frame, 4, 3)


def test_mjpeg_grayscale_frame_replicates_to_rgb():
    """A grayscale JPEG frame satisfies the RGB pixel contract by
    channel replication."""
    import numpy as np

    from parallel_map_reduce_spark.multimodal.imagehdr import build_jpeg

    frame = build_jpeg(4, 3, 1, pattern=9)
    rgb = np.frombuffer(decode_frame_pixels(frame, 4, 3), np.uint8).reshape(3, 4, 3)
    assert (rgb[:, :, 0] == rgb[:, :, 1]).all() and (rgb[:, :, 1] == rgb[:, :, 2]).all()
    cell = (128 + 2 * (((9) % 128) - 64)) % 256
    assert int(rgb[0, 0, 0]) == cell


def test_dib_frame_with_soi_prefix_not_misrouted():
    """Chunk-fourcc dispatch (review r12): a legitimate uncompressed
    DIB frame whose bottom-left pixel is BGR (255, 216, *) begins with
    the JPEG SOI bytes FF D8 — with compressed=False it must decode as
    DIB, not be sniffed into the JPEG decoder and dropped."""
    import numpy as np

    w, h = 4, 3
    stride = (w * 3 + 3) & ~3
    frame = bytearray(stride * h)
    frame[0], frame[1] = 0xFF, 0xD8  # bottom-left pixel B=255, G=216
    rgb = decode_frame_pixels(bytes(frame), w, h, compressed=False)
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert tuple(arr[h - 1, 0]) == (0, 216, 255)  # BGR -> RGB swap
    # And a full container round trip: parse_avi flags the chunk kind.
    payload, offsets = build_avi(4, 3, 2, 40000, 7)
    _, _, _, frames = parse_avi(payload)
    assert all(c is False for _, _, c in frames)
    payload_m, _ = build_avi(4, 3, 2, 40000, 7, codec="mjpg")
    _, _, _, frames_m = parse_avi(payload_m)
    assert all(c is True for _, _, c in frames_m)
