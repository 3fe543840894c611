"""NFC normalization contract (operators/unicode_norm.py +
text_unicode_nfc).

Triangulation: the fixed composition table (Spark side) is checked
here against the fixture's ``exp_nfc`` column (Python unicodedata),
and in parity against DuckDB's real ``nfc_normalize`` (utf8proc) —
three independent implementations."""

from __future__ import annotations

import unicodedata

import duckdb

from parallel_map_reduce_spark.operators.unicode_norm import (
    NFC_COMPOSE_TABLE,
    nfc_compose_column,
)
from parallel_map_reduce_spark.queries._unicode import NFC_FIXTURE_PARQUET
from parallel_map_reduce_spark.sources.catalog import read_parquet


def test_table_matches_unicodedata_and_utf8proc():
    """Every table entry agrees with BOTH reference implementations."""
    con = duckdb.connect()
    for dec, pre in NFC_COMPOSE_TABLE:
        assert unicodedata.normalize("NFC", dec) == pre
        got = con.execute("SELECT nfc_normalize(?)", [dec]).fetchone()[0]
        assert got == pre, (dec, pre, got)


def test_fixture_spark_chain_matches_exp_nfc(spark):
    """The codegen replace chain == unicodedata NFC on ALL 2000 docs."""
    fx = read_parquet(spark, NFC_FIXTURE_PARQUET)
    bad = (
        fx.select(
            "doc_id",
            nfc_compose_column("text").alias("got"),
            "exp_nfc",
        )
        .filter("got <> exp_nfc")
        .limit(3)
        .collect()
    )
    assert not bad, [(r.doc_id, r.got[:60], r.exp_nfc[:60]) for r in bad]


def test_variants_merge(spark, sf_dir):
    """The point of normalization: precomposed and decomposed
    spellings of the same word land in ONE token row, and no output
    token retains a combining mark."""
    from parallel_map_reduce_spark.queries.text_analysis import (
        text_unicode_nfc,
    )

    rows = text_unicode_nfc(spark, sf_dir).collect()
    toks = {r.token: r.n for r in rows}
    # fixture words appear in NFC form only (merged across variants)
    assert "café" in toks
    assert unicodedata.normalize("NFD", "café") not in toks
    for t in toks:
        assert not any(unicodedata.combining(c) for c in t), repr(t)
    # merged counts: café occurs in many docs across all three variant
    # modes; if variants didn't merge, three separate rows would exist
    assert toks["café"] >= 3


def test_fixture_regenerates_identically():
    import pyarrow.parquet as pq

    import tools.gen_nfc_fixture as G

    committed = pq.read_table(NFC_FIXTURE_PARQUET)
    ids = committed.column("doc_id").to_pylist()
    texts = committed.column("text").to_pylist()
    exps = committed.column("exp_nfc").to_pylist()
    assert len(ids) == G.N_DOCS
    for d in (0, 1, 17, 512, 1999):
        t, e = G.doc(d)
        assert texts[ids.index(d)] == t
        assert exps[ids.index(d)] == e
