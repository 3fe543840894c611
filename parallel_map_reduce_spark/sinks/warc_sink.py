"""WET-style WARC writing — the container loop's OTHER half.

Common Crawl publishes extracted text as WET files: WARC
``conversion`` records whose blocks are the plain text derived from a
response capture. This sink writes that shape from a DataFrame, one
``.warc.gz`` per partition (per-record gzip members, the readable-by-
our-own-source layout), composed from the SAME spec the parser
(sources/warc_format.py) enforces: strict CRLF framing, computed
Content-Length, a warcinfo head record per file, and a sha1
WARC-Block-Digest on every record — so a re-read through the strict
parser verifies integrity end-to-end (digest tri-state True).

Determinism: record ids derive from the target URI (md5-uuid), gzip
members are written with mtime=0, and each partition's records are
written in the partition's row order — a fixed input partitioning
yields byte-identical files.

Scale: executor-side ``foreachPartition`` — each task streams its own
file with O(record) memory; no driver involvement beyond the job.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os


def _rid(uri: str) -> str:
    h = hashlib.md5(f"conversion:{uri}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _b32_sha1(data: bytes) -> str:
    import base64

    return "sha1:" + base64.b32encode(hashlib.sha1(data).digest()).decode()


def conversion_record_bytes(uri: str, date: str, text: str) -> bytes:
    """One WARC/1.0 ``conversion`` record from spec (WET shape)."""
    block = text.encode("utf-8")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: {_rid(uri)}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Block-Digest: {_b32_sha1(block)}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode("utf-8") + block + b"\r\n\r\n"


def _warcinfo_bytes(part_id: int) -> bytes:
    block = (
        "software: parallel-map-reduce-spark WET writer\r\n"
        "format: WARC File Format 1.0\r\n"
    ).encode("utf-8")
    h = hashlib.md5(f"wetinfo:{part_id}".encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: <urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Block-Digest: {_b32_sha1(block)}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode("utf-8") + block + b"\r\n\r\n"


def _gz_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def write_warc_conversions(df, out_dir: str) -> None:
    """Write (uri, date, text) rows as WET files under ``out_dir`` —
    one ``part-NNNNN.warc.gz`` per non-empty partition. Executor-side;
    the caller owns directory lifecycle (clear-before-write)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first = True
        fh = None
        try:
            for row in rows:
                if first:
                    fh = open(
                        os.path.join(out_dir, f"part-{pid:05d}.warc.gz"), "wb"
                    )
                    fh.write(_gz_member(_warcinfo_bytes(pid)))
                    first = False
                fh.write(
                    _gz_member(
                        conversion_record_bytes(row.uri, row.date, row.text)
                    )
                )
        finally:
            if fh is not None:
                fh.close()

    df.select("uri", "date", "text").foreachPartition(_write)
