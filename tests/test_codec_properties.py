"""Property-based build→decode round trips for every stdlib codec
(hypothesis): randomized dimensions, channel layouts, pattern bases,
frame counts, and rates — the encoders and decoders must agree on
arbitrary shapes, not just the fixture's. Complements the
hand-assembled spec vectors in test_{pixeldec,jpegdec,videohdr}.py.
"""

from __future__ import annotations

import io
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_map_reduce_spark.multimodal.audiohdr import (
    build_wav,
    decode_wav_samples,
    parse_wav_header,
    wave_sample,
)
from parallel_map_reduce_spark.multimodal.imagehdr import (
    build_bmp,
    build_gif,
    build_jpeg,
    build_png,
    jpeg_block_value,
    parse_image_header,
    pattern_byte,
)
from parallel_map_reduce_spark.multimodal.jpegdec import decode_jpeg_pixels
from parallel_map_reduce_spark.multimodal.pixeldec import (
    decode_image_pixels,
    fit_dims,
    resize_nearest,
)
from parallel_map_reduce_spark.multimodal.videohdr import (
    build_avi,
    decode_frame_pixels,
    parse_avi,
)

dims = st.integers(min_value=1, max_value=40)
base = st.integers(min_value=0, max_value=255)


def _pattern(w, h, c, b):
    xs = np.arange(w)[None, :, None]
    ys = np.arange(h)[:, None, None]
    cs = np.arange(c)[None, None, :]
    return ((b + 3 * xs + 5 * ys + 17 * cs) % 256).astype(np.uint8)


@settings(max_examples=40, deadline=None)
@given(w=dims, h=dims, c=st.sampled_from([1, 2, 3, 4]), b=base)
def test_png_roundtrip_property(w, h, c, b):
    fmt, dw, dh, dc, px = decode_image_pixels(build_png(w, h, c, pattern=b))
    assert (fmt, dw, dh, dc) == ("png", w, h, c)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(h, w, c), _pattern(w, h, c, b)
    )


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, b=base)
def test_gif_roundtrip_property(w, h, b):
    fmt, dw, dh, dc, px = decode_image_pixels(build_gif(w, h, pattern=b))
    assert (fmt, dw, dh, dc) == ("gif", w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    exp = ((xs + ys + b) % 2 * 255).astype(np.uint8)
    assert np.array_equal(got, np.repeat(exp[:, :, None], 3, axis=2))


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, b=base)
def test_bmp_roundtrip_property(w, h, b):
    fmt, dw, dh, dc, px = decode_image_pixels(build_bmp(w, h, pattern=b))
    assert (fmt, dw, dh, dc) == ("bmp", w, h, 3)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(h, w, 3), _pattern(w, h, 3, b)
    )


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, c=st.sampled_from([1, 3]), b=base)
def test_jpeg_dc_only_roundtrip_property(w, h, c, b):
    data = build_jpeg(w, h, c, pattern=b)
    assert parse_image_header(data) == ("jpeg", w, h, c)
    dw, dh, dc, px = decode_jpeg_pixels(data)
    assert (dw, dh, dc) == (w, h, c)
    got = np.frombuffer(px, np.uint8).reshape(h, w, c)
    bxs = (np.arange(w) // 8)[None, :]
    bys = (np.arange(h) // 8)[:, None]
    exp = (128 + 2 * (((b + 3 * bxs + 5 * bys) % 128) - 64)).astype(np.uint8)
    assert np.array_equal(got, np.repeat(exp[:, :, None], c, axis=2))
    # spot-agree with the scalar block formula
    assert got[0, 0, 0] == jpeg_block_value(0, 0, b)


@settings(max_examples=20, deadline=None)
@given(w=dims, h=dims, b=base)
def test_jpeg_420_roundtrip_property(w, h, b):
    """4:2:0 subsampled DC-only files decode to the same
    block-arithmetic pixels as 4:4:4 at arbitrary (incl. non-MCU-
    aligned) dimensions."""
    dw, dh, dc, px = decode_jpeg_pixels(
        build_jpeg(w, h, 3, pattern=b, subsampling="420")
    )
    assert (dw, dh, dc) == (w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    bxs = (np.arange(w) // 8)[None, :]
    bys = (np.arange(h) // 8)[:, None]
    exp = (128 + 2 * (((b + 3 * bxs + 5 * bys) % 128) - 64)).astype(np.uint8)
    assert np.array_equal(got, np.repeat(exp[:, :, None], 3, axis=2))


@settings(max_examples=30, deadline=None)
@given(
    w=dims, h=dims, c=st.sampled_from([1, 3]), b=base,
    target=st.integers(min_value=1, max_value=64),
)
def test_resize_property(w, h, c, b, target):
    """Nearest-neighbor resample on arbitrary shapes: every output
    pixel equals its floor-mapped source pixel; dims honor the fit."""
    px = _pattern(w, h, c, b).tobytes()
    ow, oh = fit_dims(w, h, target)
    assert max(ow, oh) <= max(target, 1) and min(ow, oh) >= 1
    out = np.frombuffer(
        resize_nearest(px, w, h, c, ow, oh), np.uint8
    ).reshape(oh, ow, c)
    src = _pattern(w, h, c, b)
    for oy in (0, oh // 2, oh - 1):
        for ox in (0, ow // 2, ow - 1):
            assert (out[oy, ox] == src[oy * h // oh, ox * w // ow]).all()


@settings(max_examples=25, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    ch=st.sampled_from([1, 2]),
    frames=st.integers(min_value=1, max_value=300),
    b=base,
)
def test_wav_roundtrip_property(rate, ch, frames, b):
    payload = build_wav(rate, ch, frames, pattern=b)
    assert parse_wav_header(payload) == (rate, ch, 16, frames)
    r, c, samples = decode_wav_samples(payload)
    assert (r, c, samples.shape) == (rate, ch, (frames, ch))
    # byte-identical to the stdlib wave reader (independent spec reader)
    assert samples.astype("<i2").tobytes() == wave.open(
        io.BytesIO(payload)
    ).readframes(frames)
    fs = np.arange(frames)[:, None]
    chs = np.arange(ch)[None, :]
    assert np.array_equal(samples, (b * 31 + fs * 7 + chs * 13) % 4001 - 2000)
    assert wave_sample(0, 0, b) == samples[0, 0]


@settings(max_examples=20, deadline=None)
@given(
    w=st.sampled_from([2, 4, 6, 8, 10]),
    h=st.integers(min_value=1, max_value=8),
    nf=st.integers(min_value=1, max_value=12),
    usec=st.sampled_from([20000, 33333, 40000]),
    b=base,
)
def test_avi_roundtrip_property(w, h, nf, usec, b):
    payload, offsets = build_avi(w, h, nf, usec, b)
    pw, ph, pusec, frames = parse_avi(payload)
    assert (pw, ph, pusec) == (w, h, usec)
    assert [off for off, _, _ in frames] == offsets
    for f in (0, nf // 2, nf - 1):
        off, size, compressed = frames[f]
        rgb = np.frombuffer(
            decode_frame_pixels(payload[off : off + size], w, h, compressed),
            np.uint8,
        ).reshape(h, w, 3)
        fbase = (b + 29 * f) % 256
        assert np.array_equal(rgb, _pattern(w, h, 3, fbase))
