"""HTML extraction contract (operators/html_extract.py).

Three-way triangulation (FIXTURES.md): the committed fixture carries
``exp_text`` computed from the GENERATOR's composition knowledge —
never from the extraction regexes — so Spark == exp_text here, plus
the DuckDB oracle == Spark in parity, together prove both engines
implement the authored contract, not merely each other."""

from __future__ import annotations

import duckdb
import pytest

from parallel_map_reduce_spark.operators.html_extract import (
    html_extract_duckdb_expr,
    html_extract_text,
)
from parallel_map_reduce_spark.queries._html import HTML_FIXTURE_PARQUET
from parallel_map_reduce_spark.sources.catalog import read_parquet

NASTY = [
    # (html, expected) — one per contract clause
    ("<p>Hello <b>world</b>!</p>", "Hello world!"),
    ("<p>a</p><!-- gone --><p>b</p>", "a b"),
    ("a<!--x-->b", "ab"),  # comments vanish WITHOUT a space
    ("<script>var x = 1 < 2; s = '</p>';</script>after", "after"),
    ("<style>.c > a { color: red }</style>t", "t"),
    ("<!DOCTYPE html><body>hi</body>", "hi"),
    ("<?xml version='1.0'?>doc", "doc"),
    ("<![CDATA[x &amp; y]]>", "x & y"),  # documented decode-in-CDATA
    ("co<b>d</b>e", "code"),  # inline tags: no space
    ('<a title="a>b" href="#">link</a>.', "link."),  # quoted > in attr
    ("Fish &amp; Chips", "Fish & Chips"),
    ("&lt;b&gt; stays text", "<b> stays text"),  # decode AFTER strip
    ("caf&#233; caf&#xE9; caf&#0233; caf&#x0E9; caf&eacute;",
     "café café café café café"),
    ("&amp;lt; no double decode", "&lt; no double decode"),
    ("&unknown; survives", "&unknown; survives"),
    ("3 < 4 and 5 > 2", "3 < 4 and 5 > 2"),  # bare <> in prose
    ("a&nbsp;&nbsp;b", "a b"),  # nbsp -> space, collapsed
    ("x <em>y</em>\n\t z", "x y z"),
    ("<div attr='<'>q</div>", "q"),  # quoted < in attr
    ("<p>unclosed <q</p>", "unclosed <q"),  # tag never closes: literal
    # \x0B (vertical tab): Java \s includes it, RE2 \s does not — the
    # enumerated collapse class keeps both engines agreeing (advisor
    # r15). Both sides of this case run through BOTH engine tests.
    ("a\x0b\x0b b\x0bc", "a b c"),
]


def test_nasty_cases_spark(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(NASTY)], "doc_id long, html string"
    )
    got = {r.doc_id: r.text for r in html_extract_text(df).collect()}
    for i, (h, want) in enumerate(NASTY):
        assert got[i] == want, f"case {i}: {h!r} -> {got[i]!r} != {want!r}"


def test_nasty_cases_duckdb():
    con = duckdb.connect()
    expr = html_extract_duckdb_expr("html")
    for i, (h, want) in enumerate(NASTY):
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS html)", [h]
        ).fetchone()[0]
        assert got == want, f"case {i}: {h!r} -> {got!r} != {want!r}"


def test_fixture_spark_matches_generator_expectations(spark):
    """Spark extraction == generator-derived exp_text on ALL 2000 docs."""
    fx = read_parquet(spark, HTML_FIXTURE_PARQUET)
    joined = html_extract_text(fx.select("doc_id", "html")).join(
        fx.select("doc_id", "exp_text"), "doc_id"
    )
    bad = joined.filter("text <> exp_text")
    rows = bad.limit(3).collect()
    assert not rows, [
        (r.doc_id, r.text[:80], r.exp_text[:80]) for r in rows
    ]


def test_fixture_regenerates_identically(tmp_path):
    """The committed fixture is exactly what the generator produces
    (deterministic, no RNG) — the committed-fixture discipline."""
    import pyarrow.parquet as pq

    import tools.gen_html_fixture as G

    committed = pq.read_table(HTML_FIXTURE_PARQUET)
    ids = committed.column("doc_id").to_pylist()
    htmls = committed.column("html").to_pylist()
    exps = committed.column("exp_text").to_pylist()
    assert len(ids) == G.N_DOCS
    for d in (0, 1, 17, 512, 1999):
        h, e = G.doc(d)
        assert htmls[ids.index(d)] == h
        assert exps[ids.index(d)] == e


def test_extraction_plan_is_pure_projection(spark, sf_dir):
    """The fixture side must stay a per-row codegen projection: the
    ONLY shuffle allowed is the metadata-sized distinct feeding the
    broadcast build side of the scoping semi-join — never a shuffle of
    the (corpus-sized at 100 TB) fixture scan."""
    from parallel_map_reduce_spark.queries.text_analysis import (
        text_html_extract,
    )

    plan = text_html_extract(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # every Exchange must sit under the BroadcastExchange build side,
    # i.e. appear AFTER it in the tree printout
    first_bx = plan.index("BroadcastExchange")
    probe_side = plan[:first_bx]
    assert "Exchange" not in probe_side.replace("BroadcastExchange", ""), plan
    assert "SortMergeJoin" not in plan, plan
