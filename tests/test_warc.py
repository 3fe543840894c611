"""WARC ingestion contract (sources/warc_format.py, sources/warc.py).

Triangulation (FIXTURES.md discipline): the committed fixture's
sidecar expectations come from the GENERATOR's composition knowledge
— never from running the parser — so parser == sidecar here, plus the
DuckDB oracle == Spark in parity, together prove the parser implements
the authored spec. Malformed framing must fail LOUDLY: every rejection
case asserts WarcFormatError with the file/record named.
"""

from __future__ import annotations

import gzip
import io

import pytest

from parallel_map_reduce_spark.sources.warc_format import (
    WarcFormatError,
    dechunk,
    iter_warc_records,
    parse_http,
)

# ---------------------------------------------------------------- helpers


def rec_bytes(
    block: bytes = b"hello",
    version: bytes = b"WARC/1.0",
    headers: dict | None = None,
    cl: str | None = None,
    terminator: bytes = b"\r\n\r\n",
) -> bytes:
    h = {
        "WARC-Type": "resource",
        "WARC-Record-ID": "<urn:uuid:0>",
        "WARC-Date": "2024-01-01T00:00:00Z",
        "Content-Type": "text/plain",
    }
    h.update(headers or {})
    head = version + b"\r\n"
    for k, v in h.items():
        if v is not None:
            head += f"{k}: {v}\r\n".encode()
    head += f"Content-Length: {len(block) if cl is None else cl}\r\n\r\n".encode()
    return head + block + terminator


def parse_all(data: bytes):
    return list(iter_warc_records(io.BufferedReader(io.BytesIO(data)), src="t"))


# ------------------------------------------------------------- good paths


def test_single_record_roundtrip():
    (r,) = parse_all(rec_bytes(b"payload bytes"))
    assert r.warc_type == "resource"
    assert r.block == b"payload bytes"
    assert r.record_id == "<urn:uuid:0>"


def test_gzip_multi_member_stream():
    raw = rec_bytes(b"a") + rec_bytes(b"bb")
    members = b"".join(
        gzip.compress(rec_bytes(x)) for x in (b"a", b"bb", b"ccc")
    )
    assert len(parse_all(raw)) == 2
    got = parse_all(members)
    assert [r.block for r in got] == [b"a", b"bb", b"ccc"]


def test_warc_header_folding_and_case():
    data = (
        b"WARC/1.0\r\n"
        b"warc-type: resource\r\n"
        b"WARC-RECORD-ID: <urn:uuid:1>\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"WARC-Concurrent-To: <urn:uuid:2>\r\n <urn:uuid:3>\r\n"
        b"content-LENGTH: 2\r\n\r\nok\r\n\r\n"
    )
    (r,) = parse_all(data)
    assert r.warc_type == "resource"
    assert ("WARC-Concurrent-To", "<urn:uuid:2> <urn:uuid:3>") in r.headers


def test_http_chunked_with_ext_and_trailers():
    wire = b"3;x=y\r\nabc\r\n2\r\nde\r\n0\r\nX-T: 1\r\n\r\n"
    assert dechunk(wire, "t") == b"abcde"
    block = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + wire
    )
    msg = parse_http(block, "t")
    assert msg.status == 200 and msg.payload == b"abcde"


def test_http_gzip_content_encoding():
    body = gzip.compress(b"inner text")
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )
    assert parse_http(block, "t").payload == b"inner text"


def test_http_close_delimited_and_request():
    msg = parse_http(b"HTTP/1.0 200 OK\r\nContent-Type: a/b\r\n\r\ntail", "t")
    assert msg.payload == b"tail" and msg.status == 200
    req = parse_http(b"GET /x HTTP/1.1\r\nHost: h\r\n\r\n", "t")
    assert req.method == "GET" and req.status is None and req.payload == b""


# -------------------------------------------------- loud malformed input


@pytest.mark.parametrize(
    "data,msg",
    [
        (rec_bytes(version=b"WARC/2.0"), "bad version line"),
        (rec_bytes(cl=""), "missing/bad Content-Length"),
        (rec_bytes(cl="12x"), "missing/bad Content-Length"),
        (rec_bytes(b"hello")[:-9], "truncated block"),
        (rec_bytes(terminator=b"\r\n"), "missing record terminator"),
        (
            rec_bytes().replace(b"Content-Type: text/plain", b"NoColonLine"),
            "without colon",
        ),
        (rec_bytes(headers={"WARC-Type": None}), "missing mandatory"),
        (
            b"WARC/1.0\r\n continuation-first\r\n\r\n\r\n\r\n",
            "continuation before any field",
        ),
        (b"WARC/1.0\nWARC-Type: x\n\n", "bad version line"),
    ],
)
def test_malformed_warc_rejected(data, msg):
    with pytest.raises(WarcFormatError, match=msg):
        parse_all(data)


def test_bare_lf_header_rejected():
    data = (
        b"WARC/1.0\r\nWARC-Type: resource\nWARC-Record-ID: <u>\r\n"
        b"WARC-Date: d\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(WarcFormatError, match="bare-LF"):
        parse_all(data)


def test_truncated_gzip_member_rejected():
    member = gzip.compress(rec_bytes(b"abc"))
    with pytest.raises(WarcFormatError, match="bad gzip member"):
        parse_all(member[: len(member) - 6])


@pytest.mark.parametrize(
    "wire,msg",
    [
        (b"zz\r\nabc\r\n0\r\n\r\n", "bad chunk size"),
        (b"5\r\nab", "truncated chunk data"),
        (b"2\r\nabXX0\r\n\r\n", "missing CRLF after chunk"),
        (b"1\r\na\r\n0\r\n\r\nEXTRA", "bytes after final chunk"),
        (b"0\r\nX-T: 1\r\n", "truncated chunk trailers"),
    ],
)
def test_malformed_chunked_rejected(wire, msg):
    with pytest.raises(WarcFormatError, match=msg):
        dechunk(wire, "t")


def test_http_content_length_mismatch_rejected():
    with pytest.raises(WarcFormatError, match="!= body"):
        parse_http(b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort", "t")


def test_unsupported_content_encoding_rejected_loudly():
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\nContent-Length: 3\r\n\r\nxyz"
    with pytest.raises(WarcFormatError, match="unsupported Content-Encoding"):
        parse_http(block, "t")


def test_unsupported_transfer_encoding_rejected_loudly():
    """TE codings other than chunked/identity would surface
    still-transfer-coded bytes as the payload — fenced (advisor r16)."""
    for te in ("gzip", "gzip, chunked", "chunked, gzip", "compress"):
        block = (
            f"HTTP/1.1 200 OK\r\nTransfer-Encoding: {te}\r\n\r\n".encode()
            + b"3\r\nabc\r\n0\r\n\r\n"
        )
        with pytest.raises(WarcFormatError, match="unsupported Transfer-Encoding"):
            parse_http(block, "t")
    # identity alone (and with chunked final) stays in contract
    ok = parse_http(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: identity, chunked\r\n\r\n"
        b"3\r\nabc\r\n0\r\n\r\n",
        "t",
    )
    assert ok.payload == b"abc"


def test_http_deflate_content_encoding_both_variants():
    """Content-Encoding: deflate decodes zlib-wrapped (RFC 1950) and
    raw (RFC 1951 — the historical server bug the web standardized
    around) payloads; corrupt deflate is rejected loudly (r17)."""
    import zlib

    inner = b"deflated body text"
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw = co.compress(inner) + co.flush()
    for wire in (zlib.compress(inner), raw):  # zlib-wrapped, raw
        block = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
            + f"Content-Length: {len(wire)}\r\n\r\n".encode()
            + wire
        )
        msg = parse_http(block, "t")
        assert msg.payload == inner
        assert msg.entity == wire  # digest scope: content-encoded bytes
    bad = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\nContent-Length: 3\r\n\r\nxyz"
    with pytest.raises(WarcFormatError, match="bad deflate payload"):
        parse_http(bad, "t")


def test_bad_gzip_payload_rejected():
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\nContent-Length: 3\r\n\r\nxyz"
    with pytest.raises(WarcFormatError, match="bad gzip payload"):
        parse_http(block, "t")


class TestCharsetDecode:
    """decode_payload: WHATWG precedence (BOM > param > meta > strict
    utf-8), alias resolution, and the two loud fences (r17)."""

    def _dp(self, payload, ct):
        from parallel_map_reduce_spark.sources.warc_format import (
            decode_payload,
        )

        return decode_payload(payload, ct, "t")

    def test_declared_param_and_aliases(self):
        assert self._dp("café".encode("cp1252"),
                        "text/html; charset=ISO-8859-1") == ("windows-1252", "café")
        assert self._dp("žluť".encode("cp1250"),
                        'text/html; charset="windows-1250"') == ("windows-1250", "žluť")
        assert self._dp("中文".encode("gbk"),
                        "text/html; charset=GB2312") == ("gbk", "中文")
        assert self._dp("日本".encode("cp932"),
                        "text/plain; charset=Shift_JIS") == ("shift_jis", "日本")

    def test_meta_prescan_html_only(self):
        html = '<html><head><meta charset="koi8-r"></head><body>мир</body></html>'
        got = self._dp(html.encode("koi8_r"), "text/html")
        assert got == ("koi8-r", html)
        # http-equiv form
        h2 = ('<html><head><meta http-equiv="Content-Type" '
              'content="text/html; charset=euc-jp"></head><body>世界</body></html>')
        assert self._dp(h2.encode("euc_jp"), "text/html") == ("euc-jp", h2)
        # meta is NOT consulted for non-html types: defaults to utf-8
        assert self._dp(b"<meta charset=koi8-r> plain", "text/plain")[0] == "utf-8"

    def test_bom_beats_declaration_and_is_stripped(self):
        text = "ελληνικά"
        assert self._dp(b"\xff\xfe" + text.encode("utf-16-le"),
                        "text/html; charset=koi8-r") == ("utf-16le", text)
        assert self._dp(b"\xfe\xff" + text.encode("utf-16-be"),
                        "text/html") == ("utf-16be", text)
        assert self._dp(b"\xef\xbb\xbf" + "ök".encode(),
                        "text/html; charset=windows-1250") == ("utf-8", "ök")

    def test_default_utf8_strict(self):
        assert self._dp("日本語".encode(), "text/html") == ("utf-8", "日本語")
        with pytest.raises(WarcFormatError, match="does not decode as utf-8"):
            self._dp("café".encode("cp1252"), "text/html")  # undeclared non-utf8

    def test_wrong_declared_charset_rejected(self):
        with pytest.raises(WarcFormatError, match="does not decode as shift_jis"):
            self._dp(b"\x81", "text/html; charset=shift_jis")  # truncated lead byte
        with pytest.raises(WarcFormatError, match="does not decode as utf-16le"):
            self._dp(b"\xff\xfeabc", "text/html")  # odd byte count after BOM

    def test_unsupported_charset_rejected(self):
        with pytest.raises(WarcFormatError, match="unsupported charset 'ebcdic"):
            self._dp(b"x", "text/html; charset=ebcdic-cp-us")
        with pytest.raises(WarcFormatError, match="unsupported charset"):
            self._dp(b'<meta charset="hz-gb-2312">x', "text/html")

    def test_binary_media_types_surface_nulls(self):
        assert self._dp(b"\x89PNG\r\n", "image/png") == (None, None)
        assert self._dp(b"\x00\x01", "application/octet-stream") == (None, None)

    def test_empty_payload_decodes_empty(self):
        assert self._dp(b"", "text/html; charset=shift_jis") == ("shift_jis", "")
        assert self._dp(b"", None) == ("utf-8", "")


def test_fixture_charset_pages_roundtrip(spark):
    """Every non-UTF-8 charset sub-case in the committed fixture
    decodes back to the COMPOSED unicode string through the source."""
    from parallel_map_reduce_spark.sources.catalog import read_parquet
    from parallel_map_reduce_spark.sources.warc import read_warc

    got = (
        read_warc(spark, "/root/repo/refdata/warc")
        .filter("charset <> 'utf-8'")
        .selectExpr("src_file", "rec_ord", "charset", "payload_text")
    )
    exp = (
        read_parquet(spark, "/root/repo/refdata/warc_expected.parquet")
        .filter("charset <> 'utf-8'")
        .selectExpr("src_file", "rec_ord", "charset", "payload_text")
    )
    n = got.count()
    assert n == exp.count() and n >= 150  # 8 non-utf8 sub-cases x ~22
    assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()
    kinds = {r.charset for r in got.select("charset").distinct().collect()}
    assert kinds == {
        "windows-1252", "windows-1250", "shift_jis", "euc-jp", "gbk",
        "koi8-r", "utf-16le", "utf-16be",
    }


def test_digest_verification_tri_state():
    """sha1 digests verify True/False; non-sha1 labels surface as
    unverified (None); absent headers are None — advisory integrity,
    never a framing failure."""
    from parallel_map_reduce_spark.sources.warc_format import (
        b32_sha1,
        verify_digest,
    )

    data = b"payload bytes"
    good = b32_sha1(data)
    assert good.startswith("sha1:") and good.isupper() is False  # label lower
    assert verify_digest(good, data) is True
    assert verify_digest(good.lower(), data) is True  # case-insensitive
    assert verify_digest(b32_sha1(data + b"x"), data) is False
    assert verify_digest("md5:abcd", data) is None
    assert verify_digest(None, data) is None


def test_digest_columns_from_fixture(spark):
    """The planted wrong digest (doc_id%97==9) reads False, the
    non-sha1 label (doc_id%89==11) reads NULL, well-formed ones True
    — straight from the committed bytes through the source."""
    from parallel_map_reduce_spark.sources.warc import read_warc

    rows = (
        read_warc(spark, "/root/repo/refdata/warc")
        .filter("warc_type = 'response'")
        .selectExpr(
            "cast(regexp_extract(target_uri, '/doc/([0-9]+)', 1) AS BIGINT) AS d",
            "block_digest_ok", "payload_digest_ok",
        )
        .collect()
    )
    by_d = {r.d: r for r in rows}
    assert by_d[9].block_digest_ok is False  # planted wrong
    assert by_d[11].block_digest_ok is None  # non-sha1 label
    assert by_d[0].block_digest_ok is True
    assert by_d[0].payload_digest_ok is True
    assert by_d[2].payload_digest_ok is None  # %4==2: no payload digest
    n_false = sum(1 for r in rows if r.block_digest_ok is False)
    assert n_false == sum(1 for r in rows if r.d % 97 == 9 and r.d % 3 != 1)


def test_oversized_header_line_rejected():
    data = b"WARC/1.0\r\nX: " + b"a" * 70000 + b"\r\n\r\n\r\n\r\n"
    with pytest.raises(WarcFormatError, match="exceeds"):
        parse_all(data)


# ------------------------------------------------------ fixture contract


def test_fixture_regenerates_identically(tmp_path):
    """Committed WARC bytes and sidecar are exactly what the generator
    produces (no RNG, gzip mtime=0) — the committed-fixture discipline."""
    import pyarrow.parquet as pq

    import tools.gen_warc_fixture as G

    files = {0: bytearray(), 1: bytearray()}
    for fi in (0, 1):
        rec, _ = G.warcinfo(fi)
        files[fi] += G._gz(rec) if fi == 0 else rec
    for doc_id in range(G.N_DOCS):
        for rec, _ in G.capture(doc_id):
            files[doc_id % 2] += G._gz(rec) if doc_id % 2 == 0 else rec
    with open(f"{G.OUT_DIR}/fixture-000.warc.gz", "rb") as fh:
        assert fh.read() == bytes(files[0])
    with open(f"{G.OUT_DIR}/fixture-001.warc", "rb") as fh:
        assert fh.read() == bytes(files[1])
    assert pq.read_table(G.OUT_PARQUET).num_rows == 2807


def test_spark_source_matches_sidecar_all_records(spark):
    """The `warc` data source == composition-derived expectations for
    EVERY record in both files (all types, all framings)."""
    from parallel_map_reduce_spark.sources.catalog import read_parquet
    from parallel_map_reduce_spark.sources.warc import read_warc

    digest_cols = [
        "coalesce(cast(block_digest_ok AS INT), -1) AS bd",
        "coalesce(cast(payload_digest_ok AS INT), -1) AS pd",
    ]
    got = read_warc(spark, "/root/repo/refdata/warc").selectExpr(
        "src_file", "rec_ord", "warc_type", "record_id", "warc_date",
        "coalesce(target_uri, '<null>') AS target_uri", "content_type",
        "coalesce(http_status, -1) AS http_status",
        "coalesce(http_content_type, '<null>') AS http_content_type",
        "charset", "payload_text", "n_bytes",
        *digest_cols,
    )
    exp = read_parquet(
        spark, "/root/repo/refdata/warc_expected.parquet"
    ).selectExpr(
        "src_file", "rec_ord", "warc_type", "record_id", "warc_date",
        "coalesce(target_uri, '<null>') AS target_uri", "content_type",
        "coalesce(http_status, -1) AS http_status",
        "coalesce(http_content_type, '<null>') AS http_content_type",
        "charset", "payload_text", "n_bytes",
        *digest_cols,
    )
    assert got.count() == 2807
    assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()


def test_one_partition_per_warc_file(spark):
    """The Common Crawl unit of parallelism: one task per file."""
    from parallel_map_reduce_spark.sources.warc import read_warc

    df = read_warc(spark, "/root/repo/refdata/warc")
    assert df.rdd.getNumPartitions() == 2


def test_stream_drains_all_records_and_replays(spark):
    """The streaming flavor drains EVERY record under availableNow
    (file-granular offsets, executor-parallel partitions) and a
    committed range replays exactly (same file set -> same rows)."""
    from parallel_map_reduce_spark.sources.warc import (
        WarcStreamReader,
        register,
    )

    register(spark)
    df = (
        spark.readStream.format("warc")
        .option("path", "/root/repo/refdata/warc")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("warc_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("warc_stream_t").count() == 2807
    # replay determinism at the reader level: offsets NAME files, and
    # a committed (start, end] range replays as exactly the files
    # sorting inside it (advisor r16)
    r = WarcStreamReader({"path": "/root/repo/refdata/warc"})
    assert r.initialOffset() == {"name": ""}
    last = r.latestOffset()
    assert last["name"].endswith("fixture-001.warc")
    parts = r.partitions({"name": ""}, last)
    assert len(parts) == 2
    n = sum(1 for p in parts for _ in r.read(p))
    assert n == 2807


def test_stream_max_files_cap_never_skips(spark):
    """maxFilesPerTrigger caps the offset latestOffset RETURNS (the
    advisor r16 high: capping in partitions() alone skips the files
    beyond the cap forever). Reader-level: two capped triggers cover
    both files; query-level: availableNow with the cap drains ALL
    records across multiple micro-batches."""
    from parallel_map_reduce_spark.sources.warc import (
        WarcStreamReader,
        register,
    )

    r = WarcStreamReader(
        {"path": "/root/repo/refdata/warc", "maxFilesPerTrigger": "1"}
    )
    start = r.initialOffset()
    o1 = r.latestOffset()
    assert o1["name"].endswith("fixture-000.warc.gz")  # capped at 1 file
    assert len(r.partitions(start, o1)) == 1
    o2 = r.latestOffset()
    assert o2["name"].endswith("fixture-001.warc")
    assert len(r.partitions(o1, o2)) == 1
    assert r.latestOffset() == o2  # caught up: offset holds -> idle

    register(spark)
    df = (
        spark.readStream.format("warc")
        .option("path", "/root/repo/refdata/warc")
        .option("maxFilesPerTrigger", "1")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("warc_stream_cap_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("warc_stream_cap_t").count() == 2807


def test_stream_empty_landing_zone_idles(tmp_path, spark):
    """A stream started before the first file lands idles at the
    initial offset instead of crashing (advisor r16 medium); once a
    file lands, the next trigger picks it up."""
    from parallel_map_reduce_spark.sources.warc import WarcStreamReader

    zone = tmp_path / "zone"
    zone.mkdir()
    r = WarcStreamReader({"path": str(zone)})
    start = r.initialOffset()
    assert r.latestOffset() == start  # empty: idle, no batch
    (zone / "f-000.warc").write_bytes(rec_bytes(b"late arrival"))
    nxt = r.latestOffset()
    assert nxt["name"].endswith("f-000.warc")
    parts = r.partitions(start, nxt)
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 1 and bytes(rows[0][9]) == b"late arrival"


def test_stream_restart_never_regresses_offset():
    """A freshly-constructed reader (checkpoint restart) must never
    return an offset behind the committed one: with files present it
    reports the full listing end (uncapped first batch, documented);
    against an EMPTY zone it refuses loudly rather than regress the
    checkpoint into replaying committed files."""
    import pytest as _pytest

    from parallel_map_reduce_spark.sources.warc import WarcStreamReader

    r = WarcStreamReader(
        {"path": "/root/repo/refdata/warc", "maxFilesPerTrigger": "1"}
    )
    # no initialOffset() call: simulates restart-from-checkpoint
    o = r.latestOffset()
    assert o["name"].endswith("fixture-001.warc")  # full end, uncapped

    r2 = WarcStreamReader({"path": "/root/repo/refdata/warc"})
    # partitions() first (engine re-plans the last batch): reader
    # learns the committed point from the range end
    committed = {"name": "/root/repo/refdata/warc/fixture-000.warc.gz"}
    parts = r2.partitions(committed, committed)
    assert parts == []  # equal-offset range: nothing to replay
    assert r2.latestOffset()["name"].endswith("fixture-001.warc")


def test_stream_empty_zone_restart_refuses(tmp_path):
    from parallel_map_reduce_spark.sources.warc import WarcStreamReader

    zone = tmp_path / "zone2"
    zone.mkdir()
    r = WarcStreamReader({"path": str(zone)})
    with pytest.raises(ValueError, match="cannot name a safe offset"):
        r.latestOffset()


def test_wet_writer_bytes_are_deterministic_and_reparse(tmp_path, spark):
    """Writer output is byte-stable for a fixed partitioning, and the
    strict parser re-reads it with every digest verifying."""
    from parallel_map_reduce_spark.sinks.warc_sink import (
        write_warc_conversions,
    )
    from parallel_map_reduce_spark.sources.warc import read_warc

    df = spark.createDataFrame(
        [
            ("https://e.com/doc/1", "2024-01-01T00:00:00Z", "hello wet"),
            ("https://e.com/doc/2", "2024-01-01T00:01:37Z", "café ü 语"),
        ],
        "uri string, date string, text string",
    ).repartition(1)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc_conversions(df, d1)
    write_warc_conversions(df, d2)
    (f1,) = [p for p in sorted((tmp_path / "a").iterdir())]
    (f2,) = [p for p in sorted((tmp_path / "b").iterdir())]
    assert f1.read_bytes() == f2.read_bytes()

    rows = read_warc(spark, d1).collect()
    assert [r.warc_type for r in rows] == ["warcinfo", "conversion", "conversion"]
    conv = [r for r in rows if r.warc_type == "conversion"]
    assert {bytes(r.payload).decode() for r in conv} == {"hello wet", "café ü 语"}
    assert all(r.block_digest_ok is True for r in rows)


def test_wet_empty_partition_writes_no_file(tmp_path, spark):
    from parallel_map_reduce_spark.sinks.warc_sink import (
        write_warc_conversions,
    )

    df = spark.createDataFrame(
        [("u", "d", "t")], "uri string, date string, text string"
    ).repartition(8)
    out = str(tmp_path / "c")
    write_warc_conversions(df, out)
    files = list((tmp_path / "c").iterdir())
    assert len(files) == 1  # 7 empty partitions -> no empty files
