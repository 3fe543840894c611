"""Case-folding divergence domain — the tokenize contract's last
exclusion, pinned as data (VERDICT r15 task 3).

The committed fixture (tools/gen_casefold_divergence.py) enumerates
every code point where Spark/Java ``lower()``, DuckDB/utf8proc
``lower()``, and Python ``str.lower()`` disagree, plus the contextual
final-sigma probes. These tests re-run the sweep against the LIVE
engines and assert exact set equality — an engine upgrade that moves
the boundary fails here instead of silently shifting the unicode
tokenize contract's domain.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE = "/root/repo/refdata/casefold_divergence.parquet"


def _fixture():
    return pq.read_table(FIXTURE).to_pylist()


def test_fixture_shape_and_known_divergers():
    rows = _fixture()
    singles = [r for r in rows if r["kind"] == "single"]
    ctx = [r for r in rows if r["kind"] == "contextual"]
    assert len(ctx) == 5
    # Turkish dotted I: utf8proc drops the combining dot
    i130 = next(r for r in singles if r["cp"] == 0x130)
    assert i130["java_lower"] == "i̇"
    assert i130["utf8proc_lower"] == "i"
    assert i130["python_lower"] == "i̇"
    # final sigma: the ONE contextual rule
    fs = next(r for r in ctx if r["ch"] == "ΟΣ")
    assert fs["java_lower"] == "ος" and fs["python_lower"] == "ος"
    assert fs["utf8proc_lower"] == "οσ"
    # word-medial sigma AGREES (the rule is final-position only)
    med = next(r for r in ctx if r["ch"] == "ΟΣΟ")
    assert med["java_lower"] == med["utf8proc_lower"] == "οσο"


def test_python_and_duckdb_sweep_matches_fixture():
    """Full-code-space re-sweep of the two non-JVM engines == fixture
    (cheap: vectorized duckdb + python loop, no Spark)."""
    rows = _fixture()
    singles = {r["cp"]: r for r in rows if r["kind"] == "single"}
    cps = [cp for cp in range(0x110000) if not (0xD800 <= cp <= 0xDFFF)]
    con = duckdb.connect()
    tbl = pa.table(
        {
            "cp": pa.array(cps, pa.int64()),
            "ch": pa.array([chr(c) for c in cps], pa.string()),
        }
    )
    duck_lo = dict(con.execute("SELECT cp, lower(ch) FROM tbl").fetchall())
    for cp in cps:
        p, d = chr(cp).lower(), duck_lo[cp]
        if cp in singles:
            assert singles[cp]["python_lower"] == p, hex(cp)
            assert singles[cp]["utf8proc_lower"] == d, hex(cp)
        elif p != d:
            raise AssertionError(
                f"NEW python-vs-utf8proc divergence at {hex(cp)}: "
                f"{p!r} != {d!r} — regenerate the fixture"
            )


def test_java_sweep_matches_fixture(spark):
    """Full-code-space Spark lower() == fixture's java_lower column,
    and NO code point outside the fixture diverges from utf8proc."""
    from pyspark.sql import functions as F

    rows = _fixture()
    singles = {r["cp"]: r for r in rows if r["kind"] == "single"}
    cps = [cp for cp in range(0x110000) if not (0xD800 <= cp <= 0xDFFF)]
    df = spark.createDataFrame(
        list(zip(cps, [chr(c) for c in cps])), "cp long, ch string"
    )
    java_lo = {
        r.cp: r.lo
        for r in df.select("cp", F.lower("ch").alias("lo")).collect()
    }
    con = duckdb.connect()
    tbl = pa.table(
        {
            "cp": pa.array(cps, pa.int64()),
            "ch": pa.array([chr(c) for c in cps], pa.string()),
        }
    )
    duck_lo = dict(con.execute("SELECT cp, lower(ch) FROM tbl").fetchall())
    extra, missing = [], []
    for cp in cps:
        diverges = java_lo[cp] != duck_lo[cp] or java_lo[cp] != chr(cp).lower()
        if diverges and cp not in singles:
            extra.append(hex(cp))
        if cp in singles:
            assert singles[cp]["java_lower"] == java_lo[cp], hex(cp)
            if (
                java_lo[cp] == duck_lo[cp]
                and java_lo[cp] == chr(cp).lower()
            ):
                missing.append(hex(cp))
    assert not extra, f"NEW divergences, regenerate fixture: {extra[:10]}"
    assert not missing, f"stale fixture rows now agree: {missing[:10]}"
    # contextual probes against the live engines
    for r in rows:
        if r["kind"] != "contextual":
            continue
        j = (
            df.limit(1)
            .select(F.lower(F.lit(r["ch"])).alias("v"))
            .collect()[0]
            .v
        )
        d = con.execute("SELECT lower(?)", [r["ch"]]).fetchone()[0]
        assert j == r["java_lower"] and d == r["utf8proc_lower"], r["ch"]


def test_unicode_fixture_inputs_stay_outside_divergence_domain():
    """The tokenize-contract fixtures must never contain a divergent
    code point or a capital sigma (the contextual rule's trigger) —
    the guarantee that lets lower() appear on both engine sides."""
    singles = {
        r["cp"] for r in _fixture() if r["kind"] == "single"
    } | {0x3A3}  # capital sigma
    for path in (
        "/root/repo/refdata/unicode_fixture.parquet",
        "/root/repo/refdata/nfc_fixture.parquet",
    ):
        t = pq.read_table(path)
        for col in t.column_names:
            if t.schema.field(col).type != pa.string():
                continue
            for v in t.column(col).to_pylist():
                if v is None:
                    continue
                hit = [hex(ord(c)) for c in v if ord(c) in singles]
                assert not hit, (path, col, hit[:5])
