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


def test_widened_table_coverage():
    """r16: the table is the FULL generated set — every character
    whose canonical decomposition round-trips (Hangul algorithmic,
    one pinned oracle-version exclusion), not a hand-picked list."""
    import unicodedata as U

    from parallel_map_reduce_spark.operators.unicode_norm import (
        ORACLE_VERSION_EXCLUSIONS,
    )

    expected = 0
    for cp in range(0x110000):
        if 0xAC00 <= cp <= 0xD7A3 or cp in ORACLE_VERSION_EXCLUSIONS:
            continue
        d = U.normalize("NFD", chr(cp))
        if d != chr(cp) and U.normalize("NFC", d) == chr(cp):
            expected += 1
    assert len(NFC_COMPOSE_TABLE) == expected
    assert len(NFC_COMPOSE_TABLE) >= 900  # Vietnamese/Greek-Ext/Indic in
    # and every exclusion really is a live divergence, not a stale pin
    import duckdb as D

    from parallel_map_reduce_spark.operators.unicode_norm import (
        ORACLE_CCC_EXCLUSIONS,
        ORACLE_COMPOSITION_EXCLUSIONS,
    )

    con = D.connect()
    for cp in ORACLE_COMPOSITION_EXCLUSIONS:
        # utf8proc can't recompose the NFD form (missing pair data)
        dec = U.normalize("NFD", chr(cp))
        assert con.execute(
            "SELECT nfc_normalize(?)", [dec]
        ).fetchone()[0] != chr(cp), "exclusion no longer needed"
    for cp in ORACLE_CCC_EXCLUSIONS:
        # utf8proc reports ccc=0 for these post-release marks, so it
        # won't reorder them; witness = base + mark + ccc=1 tilde
        # overlay, which Unicode 14.0 sorts mark-last and utf8proc
        # leaves in place.
        assert U.combining(chr(cp)) > 1, hex(cp)
        s = "a" + chr(cp) + "̴"
        assert con.execute(
            "SELECT nfc_normalize(?)", [s]
        ).fetchone()[0] != U.normalize("NFC", s), (
            "ccc exclusion no longer needed: " + hex(cp)
        )


def test_python_twin_matches_real_nfc_everywhere():
    """The twin == unicodedata NFC on the NFD form of EVERY code point
    (full sweep: Hangul arithmetic, Indic pos-2 composition, exclusions
    left decomposed)."""
    import unicodedata as U

    from parallel_map_reduce_spark.operators.unicode_norm import (
        ORACLE_VERSION_EXCLUSIONS,
        nfc_compose_py,
    )

    bad = []
    for cp in range(0x110000):
        if cp in ORACLE_VERSION_EXCLUSIONS:
            continue
        nfd = U.normalize("NFD", chr(cp))
        if nfd != chr(cp) and nfc_compose_py(nfd) != U.normalize("NFC", nfd):
            bad.append(hex(cp))
    assert not bad, bad[:10]


def test_spark_expression_matches_twin_differential(spark):
    """Spark codegen expression == the Python twin over every table NFD
    form (bare + in context), a Hangul stride (NFD and LV+T partial),
    Indic base+two-part-vowel, and the supplementary surrogate edge."""
    from parallel_map_reduce_spark.operators.unicode_norm import (
        nfc_compose_py,
    )

    texts = []
    for d, _ in NFC_COMPOSE_TABLE[::7]:
        texts += [d, f"x{d}y", f"ক{d}"]
    for cp in range(0xAC00, 0xD7A4, 149):
        s = chr(cp)
        texts.append(unicodedata.normalize("NFD", s))
        si = cp - 0xAC00
        if si % 28:
            texts.append(chr(0xAC00 + (si // 28) * 28) + chr(0x11A7 + si % 28))
    texts += [
        "ক" + "ে" + "া",  # Bengali base + two-part O
        "ab\U00011099\U000110BA cd",  # supplementary NFD pair
        "", "plain", "é̠ discontiguous stays by contract",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: r.nfc
        for r in df.select(
            "id", nfc_compose_column("text").alias("nfc")
        ).collect()
    }
    bad = [
        (repr(t), repr(got[i]), repr(nfc_compose_py(t)))
        for i, t in enumerate(texts)
        if got[i] != nfc_compose_py(t)
    ]
    assert not bad, bad[:5]


def test_hangul_full_block_twin():
    """Every one of the 11172 syllables recomposes from full NFD and
    from the LV+T partial form in the twin (the Spark side is tied to
    the twin by the differential above)."""
    from parallel_map_reduce_spark.operators.unicode_norm import (
        nfc_compose_py,
    )

    for cp in range(0xAC00, 0xD7A4):
        s = chr(cp)
        assert nfc_compose_py(unicodedata.normalize("NFD", s)) == s
        si = cp - 0xAC00
        if si % 28:
            lv = chr(0xAC00 + (si // 28) * 28)
            t = chr(0x11A7 + si % 28)
            assert nfc_compose_py(lv + t) == s


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
