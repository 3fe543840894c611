"""From-spec WARC container parsing (ISO 28500 / WARC 1.0-1.1) —
stdlib only, no Spark imports: the executor-side half of the ``warc``
data source (sources/warc.py) and the unit under tests/test_warc.py.

Web crawls (Common Crawl and everything shaped like it) land as WARC
files, so this is the FRONT END of the repo's crawl-ingest chain
(VERDICT r15 task 1): WARC -> URL canon -> HTML extract -> unicode
tokenize -> dedup. The reference ingests pre-split text only
(`src/tema1.cpp:324-364` reads a manifest of plain-text files), so
this module is north-star LLM-pipeline surface, not reference parity.

CONTRACT (the parts of the spec this parser implements, strictly):

- A WARC file is a sequence of records; each record is a version line
  (``WARC/1.0`` or ``WARC/1.1``), named header fields, one blank line,
  exactly ``Content-Length`` octets of block, then CRLF CRLF. Header
  lines are CRLF-terminated; WARC 1.0 header values may fold over
  continuation lines starting with SP/HT (folds join with one space).
- ``.warc.gz`` files are a concatenation of gzip members (the Common
  Crawl layout: one record per member); the stdlib's multi-member
  ``gzip.GzipFile`` reads the stream transparently — record framing
  does not depend on member boundaries.
- Records whose ``Content-Type`` is ``application/http`` carry an HTTP
  message as their block: start line, headers, CRLF CRLF, body. The
  PAYLOAD is the body after undoing transfer framing and content
  coding, in spec order: ``Transfer-Encoding: chunked`` de-chunking
  first (RFC 9112 §7.1 — hex sizes, optional chunk extensions,
  optional trailer fields), then ``Content-Encoding`` gzip/x-gzip
  or deflate decompression (deflate per the de-facto web contract:
  zlib-wrapped RFC 1950 first, raw RFC 1951 fallback — r17). A plain
  ``Content-Length`` body must match its declared length exactly; a
  body with neither framing header is close-delimited (the rest of
  the block).

LOUD BOUNDARIES (documented, not silent): any malformed framing —
bad version line, missing/non-numeric Content-Length, truncated
block, missing record terminator, bare-LF line endings, colon-less
header lines, bad chunk sizes, trailing bytes after the last chunk,
HTTP Content-Length/body mismatch, truncated gzip members — raises
``WarcFormatError`` naming the file and record. ``Content-Encoding``
values other than gzip/x-gzip/deflate/identity (br, zstd) and
``Transfer-Encoding`` codings other than chunked/identity are
REJECTED loudly as out of contract, the same policy as the MP3/AAC
fence in multimodal/codec.py.

Scale: the parser is a pure stream consumer — one record in memory at
a time, bounded header-line length, no seeks — so a 1 GB crawl file
parses with O(record) memory on an executor.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import BinaryIO, Iterator

_MAX_LINE = 65536  # bounded header-line length: malformed input must
# not buffer unbounded bytes looking for a newline

_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


class WarcFormatError(ValueError):
    """Malformed WARC/HTTP framing — always names file + record."""


def _readline(f: BinaryIO, where: str) -> bytes:
    line = f.readline(_MAX_LINE + 2)
    if len(line) > _MAX_LINE:
        raise WarcFormatError(f"{where}: header line exceeds {_MAX_LINE} bytes")
    return line


def read_header_block(
    f: BinaryIO, where: str, encoding: str = "utf-8"
) -> list[tuple[str, str]]:
    """Named fields up to (and consuming) the blank CRLF line.
    Continuation lines (SP/HT) fold onto the previous value with one
    space — WARC 1.0 §4 / HTTP obs-fold. Strict CRLF throughout."""
    headers: list[tuple[str, str]] = []
    while True:
        line = _readline(f, where)
        if line == b"\r\n":
            return headers
        if line == b"" or not line.endswith(b"\r\n"):
            if line.endswith(b"\n"):
                raise WarcFormatError(f"{where}: bare-LF line ending")
            raise WarcFormatError(f"{where}: truncated header block")
        body = line[:-2]
        if body[:1] in (b" ", b"\t"):
            if not headers:
                raise WarcFormatError(f"{where}: continuation before any field")
            k, v = headers[-1]
            headers[-1] = (k, v + " " + body.strip().decode(encoding, "replace"))
            continue
        if b":" not in body:
            raise WarcFormatError(f"{where}: header line without colon: {body[:60]!r}")
        k, v = body.split(b":", 1)
        headers.append(
            (k.decode(encoding, "replace").strip(), v.decode(encoding, "replace").strip())
        )


def hget(headers: list[tuple[str, str]], name: str) -> str | None:
    """First value for a field name, case-insensitive (the spec's
    field-name comparison rule)."""
    low = name.lower()
    for k, v in headers:
        if k.lower() == low:
            return v
    return None


@dataclass
class WarcRecord:
    warc_type: str
    record_id: str
    warc_date: str
    target_uri: str | None
    content_type: str | None
    headers: list[tuple[str, str]]
    block: bytes


@dataclass
class HttpMessage:
    status: int | None  # responses
    method: str | None  # requests
    headers: list[tuple[str, str]]
    payload: bytes  # transfer-decoded AND content-decoded
    entity: bytes = b""  # transfer-decoded, still content-ENCODED —
    # the WARC spec's "payload" for digest purposes (§5.9: the digest
    # covers the entity as captured, before content decoding)


def b32_sha1(data: bytes) -> str:
    """``sha1:BASE32`` labelled digest (WARC §5.8/§5.9 convention,
    RFC 4648 uppercase base32 — the Common Crawl form)."""
    import base64
    import hashlib

    return "sha1:" + base64.b32encode(hashlib.sha1(data).digest()).decode()


def verify_digest(header_value: str | None, data: bytes) -> bool | None:
    """True/False when the header carries a sha1 digest we can check;
    None when absent or a non-sha1 algorithm (surfaced unverified, not
    failed — the spec allows arbitrary labelled algorithms)."""
    if header_value is None:
        return None
    v = header_value.strip()
    if not v.lower().startswith("sha1:"):
        return None
    return b32_sha1(data).lower() == v.lower()


# ---------------------------------------------------------------- charsets
#
# Charset-aware payload decode (r17, VERDICT r16 task 1): the real web
# is heavily non-UTF-8, so the text hops must resolve each page's
# encoding with the WHATWG precedence — BOM, then the Content-Type
# ``charset=`` parameter, then a bounded ``<meta>`` prescan for HTML —
# and decode STRICTLY. Labels follow a WHATWG-subset alias table
# (notably: the web's ``iso-8859-1``/``us-ascii`` labels MEAN
# windows-1252, ``gb2312`` means gbk, ``shift_jis`` means the cp932
# superset, ``euc-kr`` means cp949 — browsers standardized on the
# supersets decades ago and crawled bytes follow them). Two loud
# fences, per the codec policy: an out-of-contract label raises, and
# bytes that do not decode under the resolved charset raise (a WRONG
# declaration is data corruption to surface, never to paper over —
# which is also why the no-declaration default is strict utf-8, not
# WHATWG's mojibake-prone windows-1252 fallback: undeclared non-UTF-8
# fails loudly instead of decoding silently wrong).

# WHATWG-subset label -> canonical name (the value the `charset`
# column surfaces).
CHARSET_LABELS: dict[str, str] = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "us-ascii": "windows-1252", "ascii": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "latin1": "windows-1252", "latin-1": "windows-1252", "l1": "windows-1252",
    "cp1252": "windows-1252", "windows-1252": "windows-1252", "x-cp1252": "windows-1252",
    **{f"windows-125{i}": f"windows-125{i}" for i in range(9)},
    **{f"cp125{i}": f"windows-125{i}" for i in range(9)},
    "iso-8859-2": "iso-8859-2", "iso8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15", "iso8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "iso-8859-9": "windows-1254",  # WHATWG: the turkish label means cp1254
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "x-sjis": "shift_jis", "ms_kanji": "shift_jis", "windows-31j": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp",
    "gbk": "gbk", "gb2312": "gbk", "x-gbk": "gbk", "chinese": "gbk",
    "csgb2312": "gbk", "gb_2312-80": "gbk",
    "big5": "big5", "big5-hkscs": "big5", "x-x-big5": "big5",
    "euc-kr": "euc-kr", "korean": "euc-kr", "ks_c_5601-1987": "euc-kr",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8_r": "koi8-r",
    "koi8-u": "koi8-u", "koi8-ru": "koi8-u",
    "utf-16": "utf-16le", "utf-16le": "utf-16le", "utf-16be": "utf-16be",
}

# canonical name -> Python codec implementing the WHATWG decoder
# (cp932 IS the web's shift_jis; cp949 IS the web's euc-kr).
CHARSET_CODECS: dict[str, str] = {
    "utf-8": "utf-8",
    **{f"windows-125{i}": f"cp125{i}" for i in range(9)},
    "iso-8859-2": "iso8859-2", "iso-8859-15": "iso8859-15",
    "shift_jis": "cp932", "euc-jp": "euc_jp", "gbk": "gbk", "big5": "big5",
    "euc-kr": "cp949", "koi8-r": "koi8_r", "koi8-u": "koi8_u",
    "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

# Content types treated as opaque binary: no text decode, charset and
# payload_text surface NULL.
_BINARY_CT_PREFIXES = (
    "image/", "audio/", "video/", "font/", "application/octet-stream",
    "application/pdf", "application/zip", "application/gzip",
)

_META_PRESCAN = 1024  # the WHATWG sniffer's bounded HTML prescan


def charset_param(content_type: str | None) -> str | None:
    """The raw ``charset=`` parameter value from a media type, if any
    (quotes stripped, case preserved for the error message)."""
    if not content_type:
        return None
    for part in content_type.split(";")[1:]:
        if "=" in part:
            k, v = part.split("=", 1)
            if k.strip().lower() == "charset":
                return v.strip().strip("\"'") or None
    return None


def _canonical_charset(label: str, where: str) -> str:
    canon = CHARSET_LABELS.get(label.strip().lower())
    if canon is None:
        raise WarcFormatError(f"{where}: unsupported charset {label!r}")
    return canon


def _meta_charset(head: bytes) -> str | None:
    """Bounded prescan of the first bytes of an HTML payload for
    ``<meta charset=...>`` / ``<meta http-equiv=... content="...;
    charset=..."`` (the WHATWG sniff, simplified to one pattern: any
    ``charset=`` attribute or parameter inside a ``<meta`` tag)."""
    import re

    m = re.search(
        rb"<meta[^>]{0,256}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._\-]+)",
        head[:_META_PRESCAN],
        re.IGNORECASE,
    )
    return m.group(1).decode("ascii", "replace") if m else None


def sniff_charset(payload: bytes, content_type: str | None, where: str) -> str:
    """Canonical charset for a text payload — WHATWG precedence:
    BOM > Content-Type ``charset=`` param > HTML ``<meta>`` prescan >
    strict utf-8 default. Unknown labels raise (loud fence)."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if payload[:2] == b"\xff\xfe":
        return "utf-16le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16be"
    declared = charset_param(content_type)
    if declared is not None:
        return _canonical_charset(declared, where)
    if content_type and "html" in content_type.split(";")[0].lower():
        meta = _meta_charset(payload)
        if meta is not None:
            return _canonical_charset(meta, where)
    return "utf-8"


def decode_payload(
    payload: bytes, content_type: str | None, where: str
) -> tuple[str | None, str | None]:
    """``(canonical_charset, decoded_text)`` for a record payload:
    binary media types surface ``(None, None)``; text payloads decode
    STRICTLY under the sniffed charset, raising ``WarcFormatError`` on
    wrong-declared bytes (never silently mojibake)."""
    ct_base = (content_type or "").split(";")[0].strip().lower()
    if ct_base.startswith(_BINARY_CT_PREFIXES):
        return None, None
    canon = sniff_charset(payload, content_type, where)
    data = payload
    if canon == "utf-8" and data[:3] == b"\xef\xbb\xbf":
        data = data[3:]  # the BOM is a signature, not content
    elif canon == "utf-16le" and data[:2] == b"\xff\xfe":
        data = data[2:]
    elif canon == "utf-16be" and data[:2] == b"\xfe\xff":
        data = data[2:]
    try:
        return canon, data.decode(CHARSET_CODECS[canon])
    except UnicodeDecodeError as e:
        raise WarcFormatError(
            f"{where}: payload does not decode as {canon}: {e}"
        ) from None


def dechunk(data: bytes, where: str) -> bytes:
    """Undo chunked transfer coding (RFC 9112 §7.1): hex chunk sizes
    with optional ``;ext`` extensions, each chunk CRLF-terminated,
    a zero chunk then optional trailer fields, then nothing."""
    f = io.BufferedReader(io.BytesIO(data))
    out = bytearray()
    while True:
        line = _readline(f, where)
        if not line.endswith(b"\r\n"):
            raise WarcFormatError(f"{where}: truncated chunk-size line")
        size_tok = line[:-2].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise WarcFormatError(
                f"{where}: bad chunk size {size_tok[:20]!r}"
            ) from None
        if size == 0:
            # trailer fields until the blank line, then EOF
            while True:
                t = _readline(f, where)
                if t == b"\r\n":
                    break
                if t == b"" or not t.endswith(b"\r\n"):
                    raise WarcFormatError(f"{where}: truncated chunk trailers")
            if f.read(1) != b"":
                raise WarcFormatError(f"{where}: bytes after final chunk")
            return bytes(out)
        chunk = f.read(size)
        if len(chunk) != size:
            raise WarcFormatError(f"{where}: truncated chunk data")
        if f.read(2) != b"\r\n":
            raise WarcFormatError(f"{where}: missing CRLF after chunk")
        out += chunk


def parse_http(block: bytes, where: str) -> HttpMessage:
    """One HTTP message from a WARC application/http block: start
    line, fields, framing-decoded + content-decoded payload."""
    f = io.BufferedReader(io.BytesIO(block))
    start = _readline(f, where)
    if not start.endswith(b"\r\n"):
        raise WarcFormatError(f"{where}: truncated HTTP start line")
    start_s = start[:-2].decode("latin-1")
    status: int | None = None
    method: str | None = None
    if start_s.startswith("HTTP/"):
        parts = start_s.split(" ", 2)
        if len(parts) < 2 or not parts[1].isdigit():
            raise WarcFormatError(f"{where}: bad HTTP status line {start_s[:60]!r}")
        status = int(parts[1])
    else:
        parts = start_s.split(" ")
        if len(parts) != 3 or not parts[2].startswith("HTTP/"):
            raise WarcFormatError(f"{where}: bad HTTP request line {start_s[:60]!r}")
        method = parts[0]
    headers = read_header_block(f, where, encoding="latin-1")
    rest = f.read()

    te = hget(headers, "Transfer-Encoding")
    if te is not None:
        # The fence policy applies to TRANSFER codings too (advisor
        # r16): de-chunk when the final coding is chunked, then any
        # remaining non-identity coding (TE: gzip, deflate, ...) is
        # out of contract — surfacing still-transfer-coded bytes as
        # the payload would be silently raw.
        codings = [t.strip().lower() for t in te.split(",") if t.strip()]
        chunked = bool(codings) and codings[-1] == "chunked"
        leftover = codings[:-1] if chunked else codings
        bad = [c for c in leftover if c != "identity"]
        if bad:
            raise WarcFormatError(
                f"{where}: unsupported Transfer-Encoding {te!r}"
            )
    else:
        chunked = False
    if chunked:
        body = dechunk(rest, where)
    else:
        cl = hget(headers, "Content-Length")
        if cl is not None:
            if not cl.isdigit():
                raise WarcFormatError(f"{where}: bad HTTP Content-Length {cl!r}")
            if len(rest) != int(cl):
                raise WarcFormatError(
                    f"{where}: HTTP Content-Length {cl} != body {len(rest)}"
                )
        body = rest  # declared length verified, or close-delimited

    entity = body  # transfer-decoded, content-encoded (digest scope)
    ce = hget(headers, "Content-Encoding")
    if ce is not None:
        coding = ce.strip().lower()
        if coding in ("gzip", "x-gzip"):
            try:
                body = gzip.decompress(body)
            except (OSError, EOFError) as e:
                raise WarcFormatError(f"{where}: bad gzip payload: {e}") from None
        elif coding == "deflate":
            # RFC 9110 names the zlib-wrapped format (RFC 1950), but
            # real servers historically sent RAW deflate (RFC 1951)
            # under the same label — the standard client behavior is
            # to try zlib framing first, then raw (VERDICT r16 task
            # 2). Both failing = corrupt, rejected loudly.
            import zlib

            try:
                body = zlib.decompress(body)
            except zlib.error:
                try:
                    body = zlib.decompress(body, -15)  # raw RFC 1951
                except zlib.error as e:
                    raise WarcFormatError(
                        f"{where}: bad deflate payload: {e}"
                    ) from None
        elif coding != "identity":
            # br/zstd: out of contract, rejected LOUDLY (the
            # multimodal/codec.py fence policy) — never silently raw
            raise WarcFormatError(
                f"{where}: unsupported Content-Encoding {coding!r}"
            )
    return HttpMessage(
        status=status, method=method, headers=headers, payload=body,
        entity=entity,
    )


def iter_warc_records(raw: BinaryIO, src: str = "<stream>") -> Iterator[WarcRecord]:
    """Stream records from a plain or gzip (multi-member) WARC file.
    O(record) memory; every framing violation raises WarcFormatError."""
    if not hasattr(raw, "peek"):
        raw = io.BufferedReader(raw)  # type: ignore[arg-type]
    head = raw.peek(2)[:2]
    f: BinaryIO = raw
    if head == b"\x1f\x8b":
        f = io.BufferedReader(gzip.GzipFile(fileobj=raw))  # type: ignore[assignment]
    ord_ = 0
    while True:
        where = f"{src}: record {ord_}"
        try:
            version = _readline(f, where)
        except (OSError, EOFError) as e:
            raise WarcFormatError(f"{where}: bad gzip member: {e}") from None
        if version == b"":
            return  # clean EOF between records
        if not version.endswith(b"\r\n") or version[:-2] not in _VERSIONS:
            raise WarcFormatError(
                f"{where}: bad version line {version[:40]!r}"
            )
        headers = read_header_block(f, where)
        cl = hget(headers, "Content-Length")
        if cl is None or not cl.isdigit():
            raise WarcFormatError(f"{where}: missing/bad Content-Length {cl!r}")
        try:
            block = f.read(int(cl))
        except (OSError, EOFError) as e:
            raise WarcFormatError(f"{where}: bad gzip member: {e}") from None
        if len(block) != int(cl):
            raise WarcFormatError(
                f"{where}: truncated block ({len(block)}/{cl} bytes)"
            )
        if f.read(4) != b"\r\n\r\n":
            raise WarcFormatError(f"{where}: missing record terminator")
        wtype = hget(headers, "WARC-Type")
        rid = hget(headers, "WARC-Record-ID")
        wdate = hget(headers, "WARC-Date")
        if wtype is None or rid is None or wdate is None:
            raise WarcFormatError(
                f"{where}: missing mandatory WARC header "
                f"(type={wtype!r} id={rid!r} date={wdate!r})"
            )
        yield WarcRecord(
            warc_type=wtype,
            record_id=rid,
            warc_date=wdate,
            target_uri=hget(headers, "WARC-Target-URI"),
            content_type=hget(headers, "Content-Type"),
            headers=headers,
            block=block,
        )
        ord_ += 1
