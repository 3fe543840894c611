"""Generate the committed binary image fixture (refdata/image_fixture.parquet).

One row per doc_id 0..4999 (covers every driver sf: documents doc_ids
are 0..499 at sf0.001/sf0.01 and 0..4999 at sf0.1), with REAL image
bytes built by the stdlib builders in multimodal/imagehdr.py and the
dimensions they were built with as expected-value columns:

    doc_id BIGINT, fmt VARCHAR, payload BLOB,
    exp_width BIGINT, exp_height BIGINT, exp_channels BIGINT

The Spark side of ``multimodal_image_features`` parses width/height/
channels out of ``payload`` (multimodal/imagehdr.py:parse_image_header);
the DuckDB oracle reads the exp_* columns — written HERE, by the same
code that chose the encode parameters — so the parity check verifies
the parse against an independent record of what was encoded.

Deterministic by construction (no RNG, no time): re-running this script
reproduces the identical parquet content.

Usage: python tools/gen_image_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_spark.multimodal.imagehdr import (  # noqa: E402
    build_bmp,
    build_gif,
    build_jpeg,
    build_png,
    parse_image_header,
)

N_DOCS = 5000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "image_fixture.parquet",
)


def fixture_row(doc_id: int) -> tuple[str, bytes, int, int, int]:
    """Deterministic (fmt, payload, width, height, channels) for one doc."""
    width = (doc_id % 48) + 8
    height = ((doc_id * 7) % 36) + 8
    fmt = ("png", "gif", "bmp", "jpeg")[doc_id % 4]
    if fmt == "png":
        channels = (1, 3, 4)[doc_id % 3]
        payload = build_png(width, height, channels, pixel=doc_id % 256)
    elif fmt == "gif":
        channels = 3
        payload = build_gif(width, height)
    elif fmt == "bmp":
        channels = 3
        payload = build_bmp(width, height, pixel=doc_id % 256)
    else:
        channels = 1 if doc_id % 5 == 0 else 3
        payload = build_jpeg(width, height, channels)
    return fmt, payload, width, height, channels


def main() -> int:
    rows = {k: [] for k in ("doc_id", "fmt", "payload", "exp_width", "exp_height", "exp_channels")}
    for d in range(N_DOCS):
        fmt, payload, w, h, c = fixture_row(d)
        # Self-check: the parser must read back exactly what was encoded.
        parsed = parse_image_header(payload)
        assert parsed == (fmt, w, h, c), (d, parsed, (fmt, w, h, c))
        rows["doc_id"].append(d)
        rows["fmt"].append(fmt)
        rows["payload"].append(payload)
        rows["exp_width"].append(w)
        rows["exp_height"].append(h)
        rows["exp_channels"].append(c)
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "exp_width": pa.array(rows["exp_width"], pa.int64()),
            "exp_height": pa.array(rows["exp_height"], pa.int64()),
            "exp_channels": pa.array(rows["exp_channels"], pa.int64()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows, {os.path.getsize(OUT)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
