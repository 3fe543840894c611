"""URL canonicalization contract (operators/url_canon.py)."""

from __future__ import annotations

import duckdb

from parallel_map_reduce_spark.operators.url_canon import (
    canonical_url_column,
    canonical_url_duckdb_expr,
)
from parallel_map_reduce_spark.queries._url import URL_FIXTURE_PARQUET
from parallel_map_reduce_spark.sources.catalog import read_parquet

CASES = [
    ("HTTP://WWW.Example.COM:80/Path/?b=2&a=1#frag",
     "http://example.com/Path?a=1&b=2"),
    ("https://user:pw@Example.com:443//x/", "https://example.com//x"),
    ("https://example.com", "https://example.com/"),
    ("http://example.com/?utm_source=x&utm_medium=y", "http://example.com/"),
    ("http://example.com/p?gclid=1&z=9&a=2&fbclid=2&ref=h",
     "http://example.com/p?a=2&z=9"),
    ("http://example.com:8080/p", "http://example.com:8080/p"),
    ("https://example.com:80/p", "https://example.com:80/p"),
    ("ftp://Files.Example.com/Data", "ftp://files.example.com/Data"),
    ("not a url", "not a url"),
    ("/relative/path?x=1", "/relative/path?x=1"),
    ("http://example.com/a//b///", "http://example.com/a//b"),
    ("http://example.com/p?b=2&b=1&a=3", "http://example.com/p?a=3&b=1&b=2"),
    ("http://EXAMPLE.com/p#only-frag", "http://example.com/p"),
    ("http://example.com/Tr%61in/%44ata?x=%7Ea", "http://example.com/Train/Data?x=~a"),
    ("http://example.com/%2Fkeep?y=%2f", "http://example.com/%2Fkeep?y=%2f"),  # reserved %2F stays
    ("%41 not a url", "%41 not a url"),  # passthrough returns the ORIGINAL
    # dot-segment removal, RFC 3986 §5.2.4 (r16) — one per rule shape
    ("https://example.com/a/./b", "https://example.com/a/b"),
    ("https://example.com/a/x/../b", "https://example.com/a/b"),
    ("https://example.com/./a", "https://example.com/a"),
    ("https://example.com/../a", "https://example.com/a"),  # ../ at root drops
    ("https://example.com/a/b/c/../../d", "https://example.com/a/d"),
    ("https://example.com/a/..", "https://example.com/"),
    ("https://example.com/a/.", "https://example.com/a"),  # = RFC /a/ after trim
    ("https://example.com/..", "https://example.com/"),
    ("https://example.com/a//../b", "https://example.com/a/b"),  # empty seg pops
    ("https://example.com/a/.../b", "https://example.com/a/.../b"),  # ... is a segment
    ("https://example.com/..a/b", "https://example.com/..a/b"),  # ..a is a segment
    ("https://example.com/a/%2E%2E/b", "https://example.com/b"),  # decode, THEN remove
    ("https://example.com/" + "x/" * 6 + "../" * 6 + "end",
     "https://example.com/end"),  # depth 6 < the documented cap
]


def test_contract_cases_spark(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url_column("url").alias("c")).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r} -> {got[i]!r} != {want!r}"


def test_contract_cases_duckdb():
    con = duckdb.connect()
    expr = canonical_url_duckdb_expr("u")
    for u, want in CASES:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS u)", [u]).fetchone()[0]
        assert got == want, f"{u!r} -> {got!r} != {want!r}"


def test_fixture_spark_matches_generator_expectations(spark):
    fx = read_parquet(spark, URL_FIXTURE_PARQUET)
    bad = (
        fx.select(
            "doc_id", canonical_url_column("url").alias("got"), "exp_canonical"
        )
        .filter("got <> exp_canonical")
        .limit(3)
        .collect()
    )
    assert not bad, [(r.doc_id, r.got, r.exp_canonical) for r in bad]


def test_fixture_regenerates_identically():
    import pyarrow.parquet as pq

    import tools.gen_url_fixture as G

    committed = pq.read_table(URL_FIXTURE_PARQUET)
    ids = committed.column("doc_id").to_pylist()
    urls = committed.column("url").to_pylist()
    exps = committed.column("exp_canonical").to_pylist()
    assert len(ids) == G.N_DOCS
    for d in (0, 1, 24, 512, 1999):
        u, e = G.doc(d)
        assert urls[ids.index(d)] == u
        assert exps[ids.index(d)] == e


def test_dedup_groups_collapse_variants(spark, sf_dir):
    """Variants of one page identity must land in ONE group whose
    n_urls exceeds its... at sf0.001 the scoping keeps 500 fixture
    docs; every group's n_urls >= n_raw_forms >= 1 and at least one
    group has multiple raw forms."""
    from parallel_map_reduce_spark.queries.dedup import dedup_url_canonical

    rows = dedup_url_canonical(spark, sf_dir).collect()
    assert rows
    assert all(r.n_urls >= r.n_raw_forms >= 1 for r in rows)
    assert any(r.n_raw_forms > 1 for r in rows)
