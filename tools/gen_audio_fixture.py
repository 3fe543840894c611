"""Generate the committed audio fixture (refdata/audio_fixture.parquet).

One real audio file per doc_id 0..4999 (covers every driver sf):
every fourth doc (doc_id % 4 == 3) is a COMPRESSED FLAC stream
(multimodal/flacdec.py — fixed-predictor + Rice-coded frames, with the
stereo decorrelation rotating independent / left-side / mid-side and
the sample depth rotating 16/20/24-bit on an independent cadence; the
wider depths carry the zigzag waveform left-shifted by bps-16, so
their loudness statistics scale by exact powers of two), the rest PCM
WAVs built by multimodal/audiohdr.py — themselves rotating 16/24/8-bit
depths (24-bit carries the waveform << 8; 8-bit carries it >> 5 at
unsigned midpoint 128, both still pure formulas). Encode-time record as
expected-value columns:

    doc_id BIGINT, payload BLOB, exp_codec VARCHAR,
    exp_sample_rate BIGINT, exp_channels BIGINT, exp_n_frames BIGINT,
    exp_peak BIGINT, exp_sum_sq BIGINT

Both codecs carry the deterministic ``wave_sample`` int16 zigzag
waveform (FLAC is lossless, so decoded samples equal the formula
exactly); exp_peak / exp_sum_sq are exact integer loudness statistics
computed HERE from the waveform FORMULA alone (this script never
parses or decodes a payload), so ``multimodal_audio_loudness``'s
parity check pits the Spark container-walk + sample decode — Rice
decode and prediction reconstruction included for FLAC — against an
independent derivation. Deterministic: no RNG, no time.

Usage: python tools/gen_audio_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_spark.multimodal.audiohdr import (  # noqa: E402
    build_wav,
    parse_wav_header,
)
from parallel_map_reduce_spark.multimodal.flacdec import (  # noqa: E402
    build_flac,
    parse_flac_streaminfo,
)

N_DOCS = 5000
RATES = (8000, 16000, 22050, 44100)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "audio_fixture.parquet",
)


STEREO_MODES = ("independent", "left-side", "mid-side")


FLAC_DEPTHS = (16, 20, 24)
WAV_DEPTHS = (16, 16, 24, 8)  # majority 16-bit; every depth present


def wav_bits(doc_id: int) -> int:
    return WAV_DEPTHS[(doc_id // 8) % 4]


def flac_bps(doc_id: int) -> int:
    """Depth rotation for FLAC docs — a cadence coprime to the stereo-
    mode rotation so every (depth, mode) combination occurs."""
    return FLAC_DEPTHS[(doc_id // 12) % 3]


def fixture_row(doc_id: int) -> tuple[bytes, str, int, int, int]:
    """Deterministic (payload, codec, sample_rate, channels, n_frames)."""
    sample_rate = RATES[doc_id % 4]
    channels = 1 + (doc_id % 2)
    n_frames = (doc_id % 200) + 25
    if doc_id % 4 == 3:
        payload = build_flac(
            sample_rate, channels, n_frames, pattern=doc_id % 256,
            stereo_mode=STEREO_MODES[(doc_id // 4) % 3] if channels == 2 else "independent",
            bps=flac_bps(doc_id),
        )
        return payload, "flac", sample_rate, channels, n_frames
    payload = build_wav(
        sample_rate, channels, n_frames, bits=wav_bits(doc_id),
        pattern=doc_id % 256,
    )
    return payload, "wav", sample_rate, channels, n_frames


def expected_loudness(doc_id: int, channels: int, n_frames: int) -> tuple[int, int]:
    """(peak, sum_sq) from the waveform formula — exact integers, no
    payload bytes involved. Formula restated inline (audiohdr.py:
    wave_sample): ((base*31 + f*7 + ch*13) % 4001) - 2000; high-depth
    FLAC docs shift samples by bps-16, scaling peak by 2^s and sum_sq
    by 2^(2s)."""
    base = doc_id % 256
    fs = np.arange(n_frames, dtype=np.int64)[:, None]
    chs = np.arange(channels, dtype=np.int64)[None, :]
    samples = (base * 31 + fs * 7 + chs * 13) % 4001 - 2000
    if doc_id % 4 == 3:
        samples = samples << (flac_bps(doc_id) - 16)
    else:
        bits = wav_bits(doc_id)
        if bits == 24:
            samples = samples << 8
        elif bits == 8:
            samples = samples >> 5  # arithmetic shift, matches decode
    return int(np.abs(samples).max()), int((samples * samples).sum())


def main() -> int:
    names = (
        "doc_id", "payload", "exp_codec", "exp_sample_rate", "exp_channels",
        "exp_n_frames", "exp_peak", "exp_sum_sq",
    )
    cols: dict[str, list] = {k: [] for k in names}
    for d in range(N_DOCS):
        payload, codec, sr, ch, nf = fixture_row(d)
        if codec == "flac":
            assert parse_flac_streaminfo(payload) == (sr, ch, flac_bps(d), nf), d
        else:
            assert parse_wav_header(payload) == (sr, ch, wav_bits(d), nf), d
        peak, sum_sq = expected_loudness(d, ch, nf)
        cols["doc_id"].append(d)
        cols["payload"].append(payload)
        cols["exp_codec"].append(codec)
        cols["exp_sample_rate"].append(sr)
        cols["exp_channels"].append(ch)
        cols["exp_n_frames"].append(nf)
        cols["exp_peak"].append(peak)
        cols["exp_sum_sq"].append(sum_sq)
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "payload": pa.array(cols["payload"], pa.binary()),
            "exp_codec": pa.array(cols["exp_codec"], pa.string()),
            "exp_sample_rate": pa.array(cols["exp_sample_rate"], pa.int64()),
            "exp_channels": pa.array(cols["exp_channels"], pa.int64()),
            "exp_n_frames": pa.array(cols["exp_n_frames"], pa.int64()),
            "exp_peak": pa.array(cols["exp_peak"], pa.int64()),
            "exp_sum_sq": pa.array(cols["exp_sum_sq"], pa.int64()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows, {os.path.getsize(OUT)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
