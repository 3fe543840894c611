"""Generate the committed WAV fixture (refdata/audio_fixture.parquet).

One real PCM WAV per doc_id 0..4999 (covers every driver sf) built by
multimodal/audiohdr.py, with the encode-time parameters recorded as
expected-value columns:

    doc_id BIGINT, payload BLOB,
    exp_sample_rate BIGINT, exp_channels BIGINT, exp_n_frames BIGINT

The Spark side of ``multimodal_audio_features`` parses the RIFF/fmt/
data chunks out of ``payload``; the DuckDB oracle reads the exp_*
record written HERE by the same code that chose the encode parameters.
Deterministic: no RNG, no time.

Usage: python tools/gen_audio_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_spark.multimodal.audiohdr import (  # noqa: E402
    build_wav,
    parse_wav_header,
)

N_DOCS = 5000
RATES = (8000, 16000, 22050, 44100)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "audio_fixture.parquet",
)


def fixture_row(doc_id: int) -> tuple[bytes, int, int, int]:
    """Deterministic (payload, sample_rate, channels, n_frames)."""
    sample_rate = RATES[doc_id % 4]
    channels = 1 + (doc_id % 2)
    n_frames = (doc_id % 200) + 25
    payload = build_wav(sample_rate, channels, n_frames, sample_byte=doc_id % 256)
    return payload, sample_rate, channels, n_frames


def main() -> int:
    cols = {k: [] for k in ("doc_id", "payload", "exp_sample_rate", "exp_channels", "exp_n_frames")}
    for d in range(N_DOCS):
        payload, sr, ch, nf = fixture_row(d)
        assert parse_wav_header(payload) == (sr, ch, 16, nf), d
        cols["doc_id"].append(d)
        cols["payload"].append(payload)
        cols["exp_sample_rate"].append(sr)
        cols["exp_channels"].append(ch)
        cols["exp_n_frames"].append(nf)
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "payload": pa.array(cols["payload"], pa.binary()),
            "exp_sample_rate": pa.array(cols["exp_sample_rate"], pa.int64()),
            "exp_channels": pa.array(cols["exp_channels"], pa.int64()),
            "exp_n_frames": pa.array(cols["exp_n_frames"], pa.int64()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows, {os.path.getsize(OUT)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
