"""Generate the committed WARC fixture (refdata/warc/*.warc[.gz] +
refdata/warc_expected.parquet).

The WARC reader (sources/warc_format.py, sources/warc.py) needs a
fixture whose EXPECTED rows derive from the generator's own
composition knowledge — the image-fixture discipline: this script
COMPOSES records byte-by-byte from the WARC / HTTP specs (it never
calls the parser), records per-record expectations (type, id, date,
URI, HTTP status, decoded payload text, payload byte count) from what
it composed, and the parser is verified against them three ways:

  - pytest: Spark `warc` source rows == expected parquet for EVERY
    fixture record,
  - the driver gate: the `ingest_warc_records` oracle reads THIS
    script's parquet while Spark re-parses the WARC bytes,
  - `ingest_warc_html_text` chains the parsed payloads through the
    HTML extraction contract, whose DuckDB side re-derives the chain
    in RE2 over the expected payloads — parse + extract must BOTH
    agree for the hash to match.

Two files exercise both container framings over the same template
cycle (Common Crawl uses per-record gzip members; plain .warc is the
uncompressed layout):

  fixture-000.warc.gz  even doc_ids, one gzip member per record
  fixture-001.warc     odd doc_ids, plain concatenation

Each doc_id 0..1999 cycles through 10 capture templates: identity
Content-Length response (+request), chunked transfer coding (with
chunk extensions and trailers), Content-Encoding gzip, chunked OVER
gzip (+a metadata record), 404, 301-with-Location (empty body),
a bare resource record (no HTTP envelope), a close-delimited
response (neither Content-Length nor Transfer-Encoding) with an
occasional revisit record, a NON-UTF-8 charset page (r17: nine
sub-cases cycling windows-1252-declared-as-iso-8859-1, windows-1250,
shift_jis-via-meta, euc-jp, gbk-via-http-equiv-gb2312, koi8-r,
BOM'd utf-16le/be with no declaration, and BOM'd utf-8 — the
expected payload_text is the COMPOSED unicode string, so the hash
match proves the WHATWG sniff + strict decode), and a
Content-Encoding deflate response (r17: zlib-wrapped and raw RFC
1951 alternating, one sub-case chunked OVER deflate). Header-name
case, HTTP version, reason phrases, WARC version (1.0/1.1), and
WARC-1.0 folded headers vary on deterministic sub-cycles. Response
bodies REUSE the HTML fixture's piece compositions
(tools/gen_html_fixture.doc) so the extraction chain downstream has
real work to do.

Deterministic by construction (no RNG, no time; gzip members written
with mtime=0).

Usage: python tools/gen_warc_fixture.py
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import sys
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

try:
    from tools.gen_html_fixture import doc as html_doc
except ImportError:  # running as a script: tools/ is sys.path[0]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.gen_html_fixture import doc as html_doc

N_DOCS = 2000
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "refdata", "warc")
OUT_PARQUET = os.path.join(REPO, "refdata", "warc_expected.parquet")

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

WORDS = [
    "frontier", "capture", "seed", "fetch", "robots", "sitemap",
    "politeness", "revisit", "payload", "digest",
]


def _uri(doc_id: int) -> str:
    """The MESSY spelling captured in the WARC (r16: crawl URIs carry
    real-world noise — scheme/host case, www., default ports, tracking
    params, fragments); ``_canonical_uri`` is what the URL-canon
    contract must recover. Both are composition knowledge."""
    host = f"crawl-{doc_id % 3}.example.com"
    scheme = "HTTPS" if doc_id % 11 == 3 else "https"
    if doc_id % 7 == 2:
        host = "WWW." + host.upper()
    if doc_id % 13 == 5:
        host += ":443"
    q = ""
    if doc_id % 17 == 6:
        q = "?v=2"  # real param: survives canonicalization
    elif doc_id % 5 == 1:
        q = "?utm_source=feed"  # tracking: dropped
    frag = "#top" if doc_id % 9 == 4 else ""
    return f"{scheme}://{host}/doc/{doc_id}{q}{frag}"


def _canonical_uri(doc_id: int) -> str:
    q = "?v=2" if doc_id % 17 == 6 else ""
    return f"https://crawl-{doc_id % 3}.example.com/doc/{doc_id}{q}"


def _date(doc_id: int) -> str:
    return (_EPOCH + timedelta(seconds=doc_id * 97)).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _rid(kind: str, doc_id: int) -> str:
    h = hashlib.md5(f"{kind}:{doc_id}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _version(doc_id: int) -> str:
    return "WARC/1.1" if doc_id % 4 == 1 else "WARC/1.0"


def warc_record(version: str, header_lines: list[str], block: bytes) -> bytes:
    """Compose one record from spec: version line, fields, computed
    Content-Length, blank line, block, CRLF CRLF. A header entry may
    itself contain ``\\r\\n `` to render a WARC-1.0 folded line."""
    head = (
        version
        + "\r\n"
        + "".join(h + "\r\n" for h in header_lines)
        + f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode("utf-8") + block + b"\r\n\r\n"


def _b32_sha1(data: bytes) -> str:
    import base64

    return "sha1:" + base64.b32encode(hashlib.sha1(data).digest()).decode()


def _digest_lines(doc_id: int, block: bytes, entity: bytes | None) -> tuple[list[str], bool | None, bool | None]:
    """Digest headers for one record + the expected verification
    outcomes (composition knowledge): block digests on doc_id%3!=1,
    payload digests (entity scope: transfer-decoded, content-encoded)
    on doc_id%4!=2 when an entity exists; doc_id%97==9 plants a WRONG
    block digest (well-formed, wrong value) -> expected False; and
    doc_id%89==11 carries a non-sha1 label -> expected NULL
    (unverified by contract).""" 
    lines: list[str] = []
    block_ok: bool | None = None
    payload_ok: bool | None = None
    if doc_id % 3 != 1:
        if doc_id % 97 == 9:
            lines.append(f"WARC-Block-Digest: {_b32_sha1(block + b'x')}")
            block_ok = False
        elif doc_id % 89 == 11:
            lines.append("WARC-Block-Digest: md5:00000000000000000000000000000000")
            block_ok = None
        else:
            lines.append(f"WARC-Block-Digest: {_b32_sha1(block)}")
            block_ok = True
    if entity is not None and doc_id % 4 != 2:
        lines.append(f"WARC-Payload-Digest: {_b32_sha1(entity)}")
        payload_ok = True
    return lines, block_ok, payload_ok


def _cl_name(doc_id: int) -> str:
    return ["Content-Length", "content-length", "CONTENT-LENGTH"][doc_id % 3]


def http_response(
    doc_id: int,
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    ctype: str | None = "text/html; charset=UTF-8",
    extra: list[str] | None = None,
    framing: str = "cl",  # cl | chunked | close
) -> bytes:
    http_v = "HTTP/1.0" if doc_id % 8 == 7 else "HTTP/1.1"
    start = f"{http_v} {status}" + (f" {reason}" if reason else "")
    lines = [start, f"Date: Mon, 01 Jan 2024 00:00:{doc_id % 60:02d} GMT"]
    if ctype is not None:
        lines.append(f"Content-Type: {ctype}")
    if doc_id % 6 == 2:
        lines.append("X-Meta: alpha\r\n\tbeta resumed")  # obs-fold
    lines += extra or []
    if framing == "cl":
        lines.append(f"{_cl_name(doc_id)}: {len(body)}")
    elif framing == "chunked":
        lines.append("Transfer-Encoding: chunked")
        body = _chunked(doc_id, body)
    # close: neither header — body is close-delimited
    return ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1") + body


def http_request(doc_id: int) -> bytes:
    return (
        f"GET /doc/{doc_id} HTTP/1.1\r\n"
        f"Host: crawl-{doc_id % 3}.example.com\r\n"
        "User-Agent: graftbot/1.0\r\n"
        "Accept: text/html\r\n\r\n"
    ).encode("latin-1")


def _chunked(doc_id: int, body: bytes) -> bytes:
    """Chunked transfer coding with size-pattern, extension, and
    trailer sub-cycles."""
    sizes = (7, 19, 33)
    out, pos, i = bytearray(), 0, 0
    while pos < len(body):
        n = min(sizes[i % 3], len(body) - pos)
        ext = ";x=1" if (i == 0 and doc_id % 2 == 0) else ""
        out += f"{n:x}{ext}\r\n".encode() + body[pos : pos + n] + b"\r\n"
        pos += n
        i += 1
    out += b"0\r\n"
    if doc_id % 3 == 1:
        out += b"X-Trailer: t1\r\n"
    out += b"\r\n"
    return bytes(out)


def _gz(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=9, mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def _wh(doc_id: int, wtype: str, kind: str, ctype: str) -> list[str]:
    """Common WARC header lines for one doc's record of a given kind."""
    lines = [
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: {_rid(kind, doc_id)}",
        f"WARC-Date: {_date(doc_id)}",
        f"WARC-Target-URI: {_uri(doc_id)}",
        f"Content-Type: {ctype}",
    ]
    if kind == "request" and doc_id % 7 == 0 and _version(doc_id) == "WARC/1.0":
        # WARC-1.0 folded header (parse robustness; not surfaced)
        lines.append(
            f"WARC-Concurrent-To: {_rid('response', doc_id)}\r\n"
            f" {_rid('metadata', doc_id)}"
        )
    return lines


def _sentence(doc_id: int) -> str:
    return " ".join(
        WORDS[(doc_id * 7 + k * 3) % len(WORDS)] for k in range(4 + doc_id % 3)
    )


# Each template returns a list of (warc_bytes, expected_row) for one
# doc. expected_row = (warc_type, kind, target_uri?, content_type,
# http_status, http_content_type, payload_text, n_payload_bytes).
RESP_CT = "application/http; msgtype=response"
REQ_CT = "application/http; msgtype=request"
HTML_CT = "text/html; charset=UTF-8"


def _mk_request(doc_id: int) -> tuple[bytes, tuple]:
    block = http_request(doc_id)
    dlines, bok, pok = _digest_lines(doc_id, block, b"")
    rec = warc_record(
        _version(doc_id),
        _wh(doc_id, "request", "request", REQ_CT) + dlines,
        block,
    )
    return rec, ("request", "request", REQ_CT, None, None, "", 0, bok, pok,
                 "utf-8")


def _mk_response(
    doc_id: int, body: bytes, *, status=200, reason="OK", framing="cl",
    wire: bytes | None = None, extra: list[str] | None = None,
    http_ct: str | None = HTML_CT, text: str | None = None,
    charset: str = "utf-8",
) -> tuple[bytes, tuple]:
    entity = wire if wire is not None else body
    block = http_response(
        doc_id, entity, status=status,
        reason=reason, ctype=http_ct, extra=extra, framing=framing,
    )
    dlines, bok, pok = _digest_lines(doc_id, block, entity)
    rec = warc_record(
        _version(doc_id),
        _wh(doc_id, "response", "response", RESP_CT) + dlines,
        block,
    )
    return rec, (
        "response", "response", RESP_CT, status, http_ct,
        text if text is not None else body.decode("utf-8"),
        len(body), bok, pok, charset,
    )


# Charset sub-cases (r17): (canonical, python codec, http Content-Type,
# meta tag in <head>, BOM prefix, native-script body text). Labels
# exercise the WHATWG alias table (iso-8859-1 MEANS windows-1252,
# gb2312 MEANS gbk); BOM cases carry no declaration at all; the utf-8
# BOM case checks BOM-stripping beats the meta tag it agrees with.
# Body text is LOWERCASE-ONLY in every script so the downstream
# tokenize chain's lower() is identity cross-engine (the pinned
# casefold-divergence domain is avoided by construction).
CHARSET_CASES: list[tuple[str, str, str, str, bytes, str]] = [
    ("windows-1252", "cp1252", "text/html; charset=ISO-8859-1", "", b"",
     "café déjà vu — fenêtre à côté, œuvre añeja"),
    ("windows-1250", "cp1250", "text/html; charset=windows-1250", "", b"",
     "žluťoučký kůň úpěl ďábelské ódy"),
    ("shift_jis", "cp932", "text/html",
     '<meta charset="Shift_JIS"/>', b"",
     "日本語のページです 東京 渋谷 てすと"),
    ("euc-jp", "euc_jp", "text/html; charset=EUC-JP", "", b"",
     "こんにちは 世界 さようなら 漢字"),
    ("gbk", "gbk", "text/html",
     '<meta http-equiv="content-type" content="text/html; charset=gb2312"/>',
     b"", "中文 网页 内容 测试 数据"),
    ("koi8-r", "koi8_r", "text/html; charset=KOI8-R", "", b"",
     "привет мир тестовая страница данных"),
    ("utf-16le", "utf-16-le", "text/html", "", b"\xff\xfe",
     "ελληνικά κείμενο σελίδα δοκιμή"),
    ("utf-16be", "utf-16-be", "text/html", "", b"\xfe\xff",
     "кириллица юникод проверка текста"),
    ("utf-8", "utf-8", "text/html", "<meta charset=utf-8>", b"\xef\xbb\xbf",
     "bom page ünïcode ök señal"),
]


def charset_page(doc_id: int) -> tuple[bytes, tuple]:
    """A 200 text/html response whose body is NON-UTF-8 (or BOM'd):
    the expected payload_text is the COMPOSED unicode string — the
    parser must sniff (BOM > param > meta) and strict-decode to
    recover it. n_bytes counts the ENCODED payload including any BOM
    (the BOM is part of the payload bytes; the decode strips it)."""
    canon, codec, ct, meta, bom, native = CHARSET_CASES[(doc_id // 10) % 9]
    html = (
        f"<html><head><title>doc {doc_id}</title>{meta}</head>"
        f"<body><p>{native}</p>"
        f"<p>{_sentence(doc_id)} doc {doc_id}</p></body></html>"
    )
    payload = bom + html.encode(codec)
    return _mk_response(
        doc_id, payload, http_ct=ct, text=html, charset=canon,
    )


def _deflate(data: bytes, raw: bool) -> bytes:
    import zlib

    if raw:
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        return co.compress(data) + co.flush()
    return zlib.compress(data, 9)


def capture(doc_id: int) -> list[tuple[bytes, tuple]]:
    t = doc_id % 10
    html, _exp = html_doc(doc_id)
    body = html.encode("utf-8")
    out: list[tuple[bytes, tuple]] = []
    if t == 0:
        out.append(_mk_request(doc_id))
        out.append(_mk_response(doc_id, body))
    elif t == 1:
        reason = "" if doc_id % 5 == 3 else "OK"
        out.append(_mk_response(doc_id, body, reason=reason, framing="chunked"))
    elif t == 2:
        out.append(_mk_request(doc_id))
        out.append(
            _mk_response(
                doc_id, body, wire=_gz(body), extra=["Content-Encoding: gzip"]
            )
        )
    elif t == 3:
        out.append(
            _mk_response(
                doc_id, body, wire=_gz(body), framing="chunked",
                extra=["Content-Encoding: gzip"],
            )
        )
        meta = (
            f"via: https://crawl-{doc_id % 3}.example.com/seed\r\n"
            "hopsFromSeed: PE\r\n"
        ).encode("utf-8")
        rec = warc_record(
            _version(doc_id),
            _wh(doc_id, "metadata", "metadata", "application/warc-fields"),
            meta,
        )
        out.append(
            (rec, ("metadata", "metadata", "application/warc-fields", None,
                   None, meta.decode("utf-8"), len(meta), None, None,
                   "utf-8"))
        )
    elif t == 4:
        nf = f"<html><body><p>404 not here: doc {doc_id}</p></body></html>"
        out.append(_mk_request(doc_id))
        out.append(
            _mk_response(doc_id, nf.encode(), status=404, reason="Not Found")
        )
    elif t == 5:
        out.append(
            _mk_response(
                doc_id, b"", status=301, reason="Moved Permanently",
                extra=[f"Location: {_uri(doc_id)}?v=2"],
            )
        )
    elif t == 6:
        txt = _sentence(doc_id).encode("utf-8")
        dlines, bok, _ = _digest_lines(doc_id, txt, None)
        rec = warc_record(
            _version(doc_id),
            _wh(doc_id, "resource", "resource", "text/plain; charset=UTF-8")
            + dlines,
            txt,
        )
        out.append(
            (rec, ("resource", "resource", "text/plain; charset=UTF-8",
                   None, None, txt.decode("utf-8"), len(txt), bok, None,
                   "utf-8"))
        )
    elif t == 7:  # close-delimited response (+ occasional revisit)
        out.append(_mk_response(doc_id, body, framing="close"))
        if doc_id % 96 == 7:
            blk = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            rec = warc_record(
                _version(doc_id), _wh(doc_id, "revisit", "revisit", RESP_CT),
                blk,
            )
            out.append(
                (rec, ("revisit", "revisit", RESP_CT, 200, "text/html", "",
                       0, None, None, "utf-8"))
            )
    elif t == 8:  # non-UTF-8 / BOM charset page (r17)
        out.append(charset_page(doc_id))
    else:  # t == 9: Content-Encoding deflate (r17) — zlib-wrapped on
        # %20==9, raw RFC 1951 on %20==19; every third one chunked
        # OVER deflate (transfer decode then content decode, in order)
        wire = _deflate(body, raw=doc_id % 20 == 19)
        framing = "chunked" if doc_id % 30 == 9 else "cl"
        out.append(
            _mk_response(
                doc_id, body, wire=wire, framing=framing,
                extra=["Content-Encoding: deflate"],
            )
        )
    return out


def warcinfo(file_idx: int) -> tuple[bytes, tuple]:
    block = (
        "software: parallel-map-reduce-spark warc fixture\r\n"
        "format: WARC File Format 1.0\r\n"
    ).encode("utf-8")
    lines = [
        "WARC-Type: warcinfo",
        f"WARC-Record-ID: {_rid('warcinfo', file_idx)}",
        "WARC-Date: 2024-01-01T00:00:00Z",
        "Content-Type: application/warc-fields",
    ]
    rec = warc_record("WARC/1.0", lines, block)
    return rec, ("warcinfo", "warcinfo", "application/warc-fields", None,
                 None, block.decode("utf-8"), len(block), None, None,
                 "utf-8")


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    files = {0: bytearray(), 1: bytearray()}
    names = {0: "fixture-000.warc.gz", 1: "fixture-001.warc"}
    ords = {0: 0, 1: 0}
    rows: list[dict] = []

    def emit(file_idx: int, doc_id: int | None, rec: bytes, exp: tuple):
        (wtype, kind, ctype, status, http_ct, ptext, nbytes, bok, pok,
         cs) = exp
        files[file_idx] += _gz(rec) if file_idx == 0 else rec
        rows.append(
            {
                "doc_id": doc_id,
                "src_file": names[file_idx],
                "rec_ord": ords[file_idx],
                "warc_type": wtype,
                "record_id": _rid(kind, doc_id if doc_id is not None else file_idx),
                "warc_date": _date(doc_id) if doc_id is not None else "2024-01-01T00:00:00Z",
                "target_uri": _uri(doc_id) if doc_id is not None else None,
                "canonical_uri": _canonical_uri(doc_id) if doc_id is not None else None,
                "content_type": ctype,
                "http_status": status,
                "http_content_type": http_ct,
                "payload_text": ptext,
                "n_bytes": nbytes,
                "block_digest_ok": bok,
                "payload_digest_ok": pok,
                "charset": cs,
            }
        )
        ords[file_idx] += 1

    for fi in (0, 1):
        rec, exp = warcinfo(fi)
        emit(fi, None, rec, exp)
    for doc_id in range(N_DOCS):
        fi = doc_id % 2
        for rec, exp in capture(doc_id):
            emit(fi, doc_id, rec, exp)

    for fi, name in names.items():
        path = os.path.join(OUT_DIR, name)
        with open(path, "wb") as fh:
            fh.write(bytes(files[fi]))
        print(f"wrote {path}: {ords[fi]} records, {len(files[fi])} bytes")

    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "src_file": pa.array([r["src_file"] for r in rows], pa.string()),
            "rec_ord": pa.array([r["rec_ord"] for r in rows], pa.int64()),
            "warc_type": pa.array([r["warc_type"] for r in rows], pa.string()),
            "record_id": pa.array([r["record_id"] for r in rows], pa.string()),
            "warc_date": pa.array([r["warc_date"] for r in rows], pa.string()),
            "target_uri": pa.array([r["target_uri"] for r in rows], pa.string()),
            "canonical_uri": pa.array(
                [r["canonical_uri"] for r in rows], pa.string()
            ),
            "content_type": pa.array([r["content_type"] for r in rows], pa.string()),
            "http_status": pa.array([r["http_status"] for r in rows], pa.int32()),
            "http_content_type": pa.array(
                [r["http_content_type"] for r in rows], pa.string()
            ),
            "payload_text": pa.array([r["payload_text"] for r in rows], pa.string()),
            "n_bytes": pa.array([r["n_bytes"] for r in rows], pa.int64()),
            "block_digest_ok": pa.array(
                [r["block_digest_ok"] for r in rows], pa.bool_()
            ),
            "payload_digest_ok": pa.array(
                [r["payload_digest_ok"] for r in rows], pa.bool_()
            ),
            "charset": pa.array([r["charset"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, OUT_PARQUET, compression="zstd")
    print(f"wrote {OUT_PARQUET}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
