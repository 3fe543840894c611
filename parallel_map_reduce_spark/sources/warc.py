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

Text payloads additionally surface a charset-aware decode (r17):
``charset`` is the WHATWG-resolved encoding (BOM > Content-Type
``charset=`` param > bounded HTML ``<meta>`` prescan > strict utf-8
default) and ``payload_text`` the strict decode under it; binary
media types surface NULLs, out-of-contract or wrong-declared
charsets raise loudly (warc_format.decode_payload).

Schema::

    src_file string, rec_ord bigint, warc_type string,
    record_id string, warc_date string, target_uri string,
    content_type string, http_status int, http_content_type string,
    payload binary, n_bytes bigint, block_digest_ok boolean,
    payload_digest_ok boolean, charset string, payload_text string
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

from .warc_format import (
    decode_payload,
    hget,
    iter_warc_records,
    parse_http,
    verify_digest,
)

WARC_SCHEMA = (
    "src_file string, rec_ord bigint, warc_type string, record_id string, "
    "warc_date string, target_uri string, content_type string, "
    "http_status int, http_content_type string, payload binary, "
    "n_bytes bigint, block_digest_ok boolean, payload_digest_ok boolean, "
    "charset string, payload_text string"
)


def resolve_warc_paths(path: str, allow_empty: bool = False) -> list[str]:
    """Driver-side metadata step: a file, a directory (``*.warc`` /
    ``*.warc.gz`` inside, sorted), or a glob. Deterministic order so
    downstream rec_ord-keyed results are stable under re-planning.
    ``allow_empty`` is the streaming flavor: a landing zone with no
    files yet is an idle stream, not an error (advisor r16)."""
    if os.path.isdir(path):
        out = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith((".warc", ".warc.gz"))
        )
    elif any(c in path for c in "*?["):
        out = sorted(_glob.glob(path))
    else:
        out = [path] if os.path.exists(path) or not allow_empty else []
    if not out and not allow_empty:
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
            pay_ct = rec.content_type  # the payload's own media type
            if (rec.content_type or "").lower().startswith("application/http"):
                msg = parse_http(rec.block, f"{base}: record {ord_}")
                status = msg.status
                http_ct = hget(msg.headers, "Content-Type")
                payload = msg.payload
                digest_scope = msg.entity  # §5.9: pre-content-decoding
                pay_ct = http_ct
            # Integrity verification (r16): sha1 block/payload digests
            # checked when present; non-sha1 algorithms surface as
            # unverified (NULL), mismatches as False — advisory, never
            # a parse failure (a bad digest is data corruption to
            # report downstream, not malformed framing).
            block_ok = verify_digest(hget(rec.headers, "WARC-Block-Digest"), rec.block)
            payload_ok = verify_digest(
                hget(rec.headers, "WARC-Payload-Digest"), digest_scope
            )
            # Charset-aware text decode (r17): WHATWG precedence over
            # the payload's OWN media type (the HTTP Content-Type for
            # enveloped records, the WARC Content-Type otherwise);
            # binary media types surface NULLs, wrong/unknown charsets
            # raise loudly (warc_format.decode_payload contract).
            charset, text = decode_payload(payload, pay_ct, f"{base}: record {ord_}")
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
                charset,
                text,
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
    WARC files; each micro-batch's work is a set of WHOLE FILES — read
    in parallel on executors (one InputPartition per file, the batch
    reader's partitioning), each task streaming its file with
    O(record) memory.

    OFFSETS NAME FILES (advisor r16): an offset is the sorted path of
    the last file covered (``""`` = none), so a committed range
    ``(start, end]`` replays as exactly the files whose paths sort
    inside it — exact replay even when files later land with
    EARLIER-sorting names. Such late, earlier-sorting arrivals are
    SKIPPED by contract (documented boundary): a landing zone must
    deliver new files with names sorting after already-committed ones
    (the crawl convention of timestamp-prefixed names).

    ``maxFilesPerTrigger`` is enforced in ``latestOffset`` — the
    offset the engine commits is the CAPPED one, so capping can never
    skip files (the r16 advisor's data-loss finding). After a
    checkpoint restart the reader does not learn the committed point
    until the first ``partitions`` call, so the first planned batch
    after a restart is uncapped rather than risk returning an offset
    BEHIND the committed one (an offset regression would make the
    engine replay committed files — duplicates); the cap is a
    throughput knob, never a correctness contract. An empty landing
    zone idles at the current offset instead of raising."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires option 'path'")
        self.path = path
        self.max_files = int(options.get("maxFilesPerTrigger", "0"))  # 0 = all
        # Highest offset name this reader instance knows (initial
        # offset, a latestOffset it returned, or a partitions() range
        # end); None = restarted, committed point not yet observed.
        self._last: str | None = None

    def initialOffset(self) -> dict:
        self._last = ""
        return {"name": ""}

    def latestOffset(self) -> dict:
        paths = resolve_warc_paths(self.path, allow_empty=True)
        if self._last is None:
            # Restarted reader: the committed point is unknown until
            # partitions() reveals it. The only safe offsets are >= the
            # committed one, so report the full listing end (this one
            # batch is uncapped). An empty listing leaves NO safe
            # offset to name — refuse loudly rather than regress the
            # checkpoint and replay committed files as duplicates.
            if not paths:
                raise ValueError(
                    "warc stream: restarted from a checkpoint against an "
                    f"empty landing zone {self.path!r} — cannot name a "
                    "safe offset; restore the files or start fresh"
                )
            name = paths[-1]
        else:
            pending = [p for p in paths if p > self._last]
            if self.max_files:
                pending = pending[: self.max_files]
            name = pending[-1] if pending else self._last
        self._last = max(self._last or "", name)
        return {"name": name}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["name"], end["name"]
        # Learn the committed point (restart path) and never move the
        # reader's own watermark backwards.
        self._last = max(self._last or "", lo, hi)
        if hi <= lo:
            return []
        paths = resolve_warc_paths(self.path, allow_empty=True)
        return [WarcFilePartition(p) for p in paths if lo < p <= hi]

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
