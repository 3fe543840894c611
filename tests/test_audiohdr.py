"""WAV header codec: build→parse round trips cross-checked against the
stdlib ``wave`` module (the spec, not our builder), malformed-input
rejection, fixture self-consistency, and the Arrow path computing TRUE
audio metadata (the round-11 image-decode discipline applied to audio).
"""

from __future__ import annotations

import io
import struct
import wave

import pytest

from parallel_map_reduce_spark.multimodal.audiohdr import (
    build_wav,
    parse_wav_header,
)

FIXTURE = "/root/repo/refdata/audio_fixture.parquet"


@pytest.mark.parametrize(
    ("rate", "ch", "frames"),
    [(8000, 1, 1), (16000, 1, 100), (22050, 2, 50), (44100, 2, 333)],
)
def test_build_parse_roundtrip_and_stdlib_wave_agreement(rate, ch, frames):
    payload = build_wav(rate, ch, frames, sample_byte=7)
    assert parse_wav_header(payload) == (rate, ch, 16, frames)
    w = wave.open(io.BytesIO(payload))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth() * 8, w.getnframes()) == (
        rate,
        ch,
        16,
        frames,
    )


def test_hand_built_wav_bytes():
    """Parse a WAV assembled by hand (not via build_wav), with an extra
    LIST chunk before data — the parser must walk chunks, not assume
    fixed offsets."""
    fmt = struct.pack("<HHIIHH", 1, 2, 12000, 12000 * 4, 4, 16)
    data = b"\x00" * 40  # 10 frames of 2ch 16-bit
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"LIST" + struct.pack("<I", 4) + b"INFO"
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_wav_header(payload) == (12000, 2, 16, 10)


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks
        b"RIFF\x00\x00\x00\x00AVI ",  # not WAVE
        b"not audio at all",
        # non-PCM format code must be rejected, not misreported
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", 0),
    ],
)
def test_malformed_rejected(junk):
    assert parse_wav_header(junk) is None


def test_fixture_parse_matches_encode_record():
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.multimodal.flacdec import parse_flac_streaminfo

    t = pq.read_table(FIXTURE)
    for d, payload, codec, sr, ch, nf in zip(
        t["doc_id"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_codec"].to_pylist(),
        t["exp_sample_rate"].to_pylist(),
        t["exp_channels"].to_pylist(),
        t["exp_n_frames"].to_pylist(),
    ):
        if codec == "flac":
            from tools.gen_audio_fixture import flac_bps

            assert parse_flac_streaminfo(payload) == (sr, ch, flac_bps(d), nf), d
            assert parse_wav_header(payload) is None, d
        else:
            from tools.gen_audio_fixture import wav_bits

            assert parse_wav_header(payload) == (sr, ch, wav_bits(d), nf), d


def test_fixture_generator_is_deterministic():
    import pyarrow.parquet as pq

    from tools.gen_audio_fixture import fixture_row

    t = pq.read_table(FIXTURE).slice(0, 64)
    for d, payload, codec, sr, ch, nf in zip(
        t["doc_id"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_codec"].to_pylist(),
        t["exp_sample_rate"].to_pylist(),
        t["exp_channels"].to_pylist(),
        t["exp_n_frames"].to_pylist(),
    ):
        assert fixture_row(d) == (payload, codec, sr, ch, nf)


def test_sample_decode_agrees_with_stdlib_wave():
    """decode_wav_samples vs the stdlib ``wave`` module reading the
    same payload: the raw frame BYTES must be identical (wave is the
    independent spec reader), and the int16 view must match the
    waveform formula."""
    import numpy as np

    from parallel_map_reduce_spark.multimodal.audiohdr import (
        decode_wav_samples,
        wave_sample,
    )

    for (rate, ch, frames, base) in [(8000, 1, 25, 0), (22050, 2, 117, 200)]:
        payload = build_wav(rate, ch, frames, pattern=base)
        r, c, samples = decode_wav_samples(payload)
        assert (r, c, samples.shape) == (rate, ch, (frames, ch))
        w = wave.open(io.BytesIO(payload))
        assert samples.astype("<i2").tobytes() == w.readframes(frames)
        for f in (0, frames // 2, frames - 1):
            for chan in range(ch):
                assert samples[f, chan] == wave_sample(f, chan, base)


def test_sample_decode_rejects_non_pcm():
    from parallel_map_reduce_spark.multimodal.audiohdr import decode_wav_samples

    with pytest.raises(ValueError):
        decode_wav_samples(b"not audio")
    # 8-bit PCM decodes since r13 (unsigned midpoint-128 convention)
    _r, _c, arr = decode_wav_samples(build_wav(8000, 1, 10, bits=8))
    assert arr.ravel().tolist() == [-128] * 10


def test_audio_fixture_loudness_matches_formula_record():
    """Every committed payload's decoded samples reproduce the
    generator's formula-derived peak/sum_sq exactly."""
    import numpy as np
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.multimodal.codec import decode_audio

    t = pq.read_table(FIXTURE)
    for d, payload, peak, ssq in zip(
        t["doc_id"].to_pylist(),
        t["payload"].to_pylist(),
        t["exp_peak"].to_pylist(),
        t["exp_sum_sq"].to_pylist(),
    ):
        _r, _c, samples = decode_audio(payload)
        flat = samples.astype(np.int64).ravel()
        assert int(np.abs(flat).max()) == peak, d
        assert int(np.dot(flat, flat)) == ssq, d


def test_map_in_pandas_real_loudness(spark):
    """The registered loudness query's Spark path equals the fixture's
    formula-derived record for a sample of docs."""
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.queries.multimodal import (
        multimodal_audio_loudness,
    )

    rows = {
        r.doc_id: r
        for r in multimodal_audio_loudness(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id")
        .limit(16)
        .collect()
    }
    t = pq.read_table(FIXTURE).slice(0, 16)
    for d, ch, nf, peak, ssq in zip(
        t["doc_id"].to_pylist(),
        t["exp_channels"].to_pylist(),
        t["exp_n_frames"].to_pylist(),
        t["exp_peak"].to_pylist(),
        t["exp_sum_sq"].to_pylist(),
    ):
        r = rows[d]
        assert (r.n_samples, r.peak, r.sum_sq) == (nf * ch, peak, ssq), d
        assert r.rms == round((ssq / (nf * ch)) ** 0.5, 4), d


def test_loudness_map_skips_undecodable_rows():
    """The map body must SKIP undecodable payloads (the other decode
    maps' one-in/at-most-one-out contract), not crash the batch. An
    8-bit WAV is DECODABLE since r13; a 12-bit depth is not."""
    import pandas as pd

    from parallel_map_reduce_spark.multimodal.codec import audio_loudness_map

    good = build_wav(8000, 1, 10, pattern=3)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 12)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    bad_bits = b"RIFF" + struct.pack("<I", len(body)) + body
    ok8 = build_wav(8000, 1, 10, bits=8, pattern=3)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "payload": [good, bad_bits, b"not audio", ok8]}
    )
    (out,) = list(audio_loudness_map(iter([pdf])))
    assert out["doc_id"].tolist() == [1, 4]


def test_map_in_pandas_true_audio_metadata(spark):
    from parallel_map_reduce_spark.queries.multimodal import (
        multimodal_audio_features,
    )

    from tools.gen_audio_fixture import fixture_row

    rows = (
        multimodal_audio_features(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id")
        .limit(8)
        .collect()
    )
    assert rows
    for r in rows:
        payload, _codec, sr, ch, nf = fixture_row(r.doc_id)
        assert (r.sample_rate, r.channels, r.n_frames) == (sr, ch, nf)
        assert r.n_bytes == len(payload)
        assert r.duration_s == nf / sr


@pytest.mark.parametrize("bits", [8, 24])
def test_wav_depth_roundtrip_matches_formula(bits):
    """8/24-bit PCM WAV (r13): build → decode reproduces the depth-
    scaled waveform formula (24-bit << 8 as int32; 8-bit >> 5 stored
    unsigned-midpoint-128, back signed-centered as int16)."""
    import numpy as np

    from parallel_map_reduce_spark.multimodal.audiohdr import (
        build_wav,
        decode_wav_samples,
        wave_sample,
    )

    sr, ch, nf, base = 16000, 2, 120, 55
    payload = build_wav(sr, ch, nf, bits=bits, pattern=base)
    dsr, dch, arr = decode_wav_samples(payload)
    assert (dsr, dch) == (sr, ch)
    assert arr.dtype == (np.int32 if bits == 24 else np.int16)
    exp = np.array(
        [
            [
                (wave_sample(f, c, base) << 8)
                if bits == 24
                else (wave_sample(f, c, base) >> 5)
                for c in range(ch)
            ]
            for f in range(nf)
        ],
        arr.dtype,
    )
    assert (arr == exp).all()


def test_wav_24bit_sign_extension_edges():
    """Packed 3-byte samples at the int24 extremes must sign-extend
    correctly — a wrong bit-23 treatment flips -2^23 to +2^23."""
    import struct

    import numpy as np

    from parallel_map_reduce_spark.multimodal.audiohdr import decode_wav_samples

    vals = [-(1 << 23), (1 << 23) - 1, -1, 0, 1]
    data = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(out)) + out
    _sr, _ch, arr = decode_wav_samples(payload)
    assert arr.ravel().tolist() == vals and arr.dtype == np.int32


def test_wav_unsupported_depth_rejected():
    import struct

    import pytest as _pytest

    from parallel_map_reduce_spark.multimodal.audiohdr import decode_wav_samples

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 12)
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    payload = b"RIFF" + struct.pack("<I", len(out)) + out
    with _pytest.raises(ValueError, match="unsupported PCM sample depth"):
        decode_wav_samples(payload)
