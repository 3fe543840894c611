"""``warc`` — a PySpark 4 Python Data Source over WARC crawl files.

The distributed half of the crawl-ingest front end (VERDICT r15 task
1): sources/warc_format.py parses records from spec; this module maps
files onto Spark's execution model the way the Common Crawl layout
wants — ONE InputPartition PER WARC FILE (a crawl is tens of
thousands of ~1 GB files; file-level parallelism is the natural unit
because per-record gzip members make byte-range splits worthless),
each executor task STREAMING its file record-by-record with O(record)
memory. This is the same partitioning discipline as
sources/pyds_manifest.py (one task per manifest file, ids native to
the partitioning).

Rows surface one record each, with the HTTP envelope already opened
for ``application/http`` blocks: transfer framing (chunked) and
content coding (gzip) undone, the payload as raw bytes plus its
declared HTTP Content-Type, and the WARC-level headers verbatim
(record id, date, target URI, WARC content type). Non-HTTP records
(warcinfo, metadata, resource) surface their block as the payload.

Scale note: like the manifest source, rows cross the Arrow boundary
once at ingest; a 100 TB corpus lands in parquet right after this
hop (sources.catalog) and every downstream operator reads columnar.

Schema::

    src_file string, rec_ord bigint, warc_type string,
    record_id string, warc_date string, target_uri string,
    content_type string, http_status int, http_content_type string,
    payload binary, n_bytes bigint
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .warc_format import hget, iter_warc_records, parse_http, verify_digest

WARC_SCHEMA = (
    "src_file string, rec_ord bigint, warc_type string, record_id string, "
    "warc_date string, target_uri string, content_type string, "
    "http_status int, http_content_type string, payload binary, "
    "n_bytes bigint, block_digest_ok boolean, payload_digest_ok boolean"
)


def resolve_warc_paths(path: str) -> list[str]:
    """Driver-side metadata step: a file, a directory (``*.warc`` /
    ``*.warc.gz`` inside, sorted), or a glob. Deterministic order so
    downstream rec_ord-keyed results are stable under re-planning."""
    if os.path.isdir(path):
        out = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith((".warc", ".warc.gz"))
        )
    elif any(c in path for c in "*?["):
        out = sorted(_glob.glob(path))
    else:
        out = [path]
    if not out:
        raise ValueError(f"warc source: no WARC files under {path!r}")
    return out


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _rows_for_file(path: str):
    """Executor-side: stream one file's records as schema-shaped rows."""
    base = os.path.basename(path)
    with open(path, "rb") as fh:
        for ord_, rec in enumerate(iter_warc_records(fh, src=base)):
            status = None
            http_ct = None
            payload = rec.block
            digest_scope = rec.block  # payload digest scope (non-http)
            if (rec.content_type or "").lower().startswith("application/http"):
                msg = parse_http(rec.block, f"{base}: record {ord_}")
                status = msg.status
                http_ct = hget(msg.headers, "Content-Type")
                payload = msg.payload
                digest_scope = msg.entity  # §5.9: pre-content-decoding
            # Integrity verification (r16): sha1 block/payload digests
            # checked when present; non-sha1 algorithms surface as
            # unverified (NULL), mismatches as False — advisory, never
            # a parse failure (a bad digest is data corruption to
            # report downstream, not malformed framing).
            block_ok = verify_digest(hget(rec.headers, "WARC-Block-Digest"), rec.block)
            payload_ok = verify_digest(
                hget(rec.headers, "WARC-Payload-Digest"), digest_scope
            )
            yield (
                base,
                ord_,
                rec.warc_type,
                rec.record_id,
                rec.warc_date,
                rec.target_uri,
                rec.content_type,
                status,
                http_ct,
                payload,
                len(payload),
                block_ok,
                payload_ok,
            )


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires option 'path'")
        self.path = path

    def partitions(self) -> list[InputPartition]:
        return [WarcFilePartition(p) for p in resolve_warc_paths(self.path)]

    def read(self, partition: WarcFilePartition):
        yield from _rows_for_file(partition.path)


class WarcStreamReader(DataSourceStreamReader):
    """Streaming flavor: a crawl landing zone is an ordered log of
    WARC files, so the offset is an index into the sorted listing and
    each micro-batch's work is a set of WHOLE FILES — read in parallel
    on executors (one InputPartition per file, the batch reader's
    partitioning), each task streaming its file with O(record)
    memory. ``maxFilesPerTrigger`` bounds a trigger's file count; the
    listing is re-taken per ``latestOffset`` call, so files that land
    later are picked up by later triggers. Restart-safe: offsets name
    file positions in the deterministic sorted order, and a committed
    range replays by re-parsing exactly those files."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires option 'path'")
        self.path = path
        self.max_files = int(options.get("maxFilesPerTrigger", "0"))  # 0 = all

    def initialOffset(self) -> dict:
        return {"file": 0}

    def latestOffset(self) -> dict:
        n = len(resolve_warc_paths(self.path))
        return {"file": n}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        paths = resolve_warc_paths(self.path)
        lo, hi = start["file"], min(end["file"], len(paths))
        if self.max_files:
            hi = min(hi, lo + self.max_files)
        return [WarcFilePartition(p) for p in paths[lo:hi]]

    def read(self, partition: WarcFilePartition):
        yield from _rows_for_file(partition.path)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: the landing zone owns the files


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(path_or_glob)``"""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration with a session."""
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path: str):
    """Registered-and-loaded in one call."""
    register(spark)
    return spark.read.format("warc").option("path", path).load()
