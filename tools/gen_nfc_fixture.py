"""Generate the committed NFC-normalization fixture
(refdata/nfc_fixture.parquet).

The NFC contract entry (text_unicode_nfc) needs texts where the SAME
logical word appears both precomposed and canonically DECOMPOSED
(base + combining marks), so that normalize-then-tokenize provably
merges the variants. A separate fixture — NOT a regeneration of
unicode_fixture.parquet — because r14's bench-drift investigation
(VERDICT task 4) lists fixture regeneration as a suspect; the five
existing unicode entries' inputs stay byte-identical this round.

One row per doc_id 0..1999: doc_id BIGINT, text VARCHAR, exp_nfc
VARCHAR where exp_nfc = unicodedata.normalize('NFC', text) — an
expectation from Python's unicodedata, INDEPENDENT of both engines
under test (Spark's fixed composition table, DuckDB's utf8proc).

Domain discipline (r16 widened table; r17 full UAX #15): every
emitted text is asserted at generation time to normalize identically
under the operator's Python twin (``nfc_compose_py`` — the exact
mirror of the Spark expression) and real ``unicodedata`` NFC;
DuckDB's utf8proc ``nfc_normalize`` is the third implementation,
checked in parity. The word pool covers the full table's breadth:
Vietnamese stacked diacritics (Latin Extended Additional), polytonic
Greek (Greek Extended), Hangul (full-jamo NFD AND partially-composed
LV-syllable + T-jamo forms — both algorithmic composition paths),
Indic two-part vowels (Bengali/Tamil, whose decompositions start with
spacing marks), a supplementary-plane letter (surrogate-safe split),
singletons (U+212B ANGSTROM, U+2126 OHM) and a composition-exclusion
char (U+0958, which NFC leaves DECOMPOSED), and the original
Latin/Greek/Cyrillic set. Since r17 the operator implements the FULL
UAX #15 algorithm, so two previously-out-of-domain variant shapes are
now emitted: DISCONTIGUOUS composition (a ccc=220 U+0320 inserted
between base and mark — the starter composes with the LATER mark) and
MISORDERED marks (the first multi-mark sequence reversed, forcing
canonical reordering before composition). Deterministic by
construction (no RNG, no time).

Usage: python tools/gen_nfc_fixture.py
"""

from __future__ import annotations

import os
import sys
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_spark.operators.unicode_norm import (  # noqa: E402
    NFC_COMPOSE_TABLE,
    nfc_compose_py,
)

N_DOCS = 2000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "nfc_fixture.parquet",
)

# Precomposed spellings; variants are derived per use site.
WORDS = [
    "café", "déjà", "naïve", "garçon", "señor", "über", "köln",
    "àpropos", "fête", "crème", "piñata", "ångström", "møre",  # ø has no decomposition: passes through
    "λόγος", "ψυχή", "φύση", "γλώσσα", "ταΰγετος", "προΐόν",
    "йогурт", "ёлка", "Йемен", "весёлый",
    "plain", "ascii", "tokens", "mixed42",
    # r16 widened-table rows — Vietnamese stacked diacritics
    "phở", "tiếng", "người", "Việt", "được", "những", "trường",
    # Latin Extended Additional / polytonic Greek
    "ṽẽṙḃ", "ḉḝṻ", "ἄνθρωπος", "ᾠδή", "ῥήτωρ", "ᾆσμα",
    # Hangul (full NFD and LV+T partial variants exercised below)
    "한국어", "서울", "글자", "조합형", "훈민정음",
    # Indic two-part vowels (decompositions start with spacing marks)
    "কোথায়", "கோவில்", "கௌரவம்",
    # supplementary-plane letter (U+1109A, surrogate-safe split)
    "ab\U0001109Acd",
    # r17 — singletons (NFC maps the char itself) + composition
    # exclusion (NFC leaves it decomposed)
    "10Å", "Ωhm", "क़ख़ग़lam",
]
SEPS = [" ", ", ", " — ", " 7 ", "。", " 🚀 ", "\t"]


_S_BASE, _T_BASE, _T_COUNT = 0xAC00, 0x11A7, 28


def _hangul_lv_t(word: str) -> str:
    """Split the FIRST LVT syllable into precomposed-LV + T jamo —
    the partial form NFC's algorithmic LV+T composition re-joins."""
    out, done = [], False
    for ch in unicodedata.normalize("NFC", word):
        cp = ord(ch)
        si = cp - _S_BASE
        if not done and 0 <= si < 11172 and si % _T_COUNT:
            out.append(chr(_S_BASE + (si // _T_COUNT) * _T_COUNT))
            out.append(chr(_T_BASE + si % _T_COUNT))
            done = True
        else:
            out.append(ch)
    return "".join(out)


def _discontiguous(word: str) -> str:
    """Insert U+0320 (ccc 220) between the first composable base and
    its marks — real NFC composes the starter with the LATER mark
    across it (or with a lower-ccc mark first), exercising the r17
    blocking-rule fold; falls back to NFD when nothing composes."""
    out, done = [], False
    for ch in unicodedata.normalize("NFC", word):
        d = unicodedata.normalize("NFD", ch)
        if not done and len(d) > 1:
            out.append(d[0] + "̠" + d[1:])
            done = True
        else:
            out.append(ch)
    return "".join(out) if done else unicodedata.normalize("NFD", word)


def _misordered(word: str) -> str:
    """Reverse the first run of >=2 combining marks in the NFD form,
    forcing canonical REORDERING before composition (r17); falls back
    to NFD for words without a multi-mark sequence."""
    nfd = unicodedata.normalize("NFD", word)
    out, i, done = [], 0, False
    while i < len(nfd):
        j = i
        while j < len(nfd) and unicodedata.combining(nfd[j]):
            j += 1
        if j > i:  # a run of combining marks
            run = nfd[i:j]
            if not done and len(run) >= 2:
                run = run[::-1]
                done = True
            out.append(run)
            i = j
        else:
            out.append(nfd[i])
            i += 1
    return "".join(out)


def variant(word: str, mode: int) -> str:
    if mode == 3:
        # Hangul partial (LV + T); falls through to NFD for words
        # without an LVT syllable so every mode stays meaningful
        lv_t = _hangul_lv_t(word)
        if lv_t != unicodedata.normalize("NFC", word):
            return lv_t
        return unicodedata.normalize("NFD", word)
    if mode == 0:
        return unicodedata.normalize("NFC", word)
    if mode == 1:
        return unicodedata.normalize("NFD", word)
    if mode == 4:
        return _discontiguous(word)
    if mode == 5:
        return _misordered(word)
    # mixed: decompose only the first composable character
    out, done = [], False
    for ch in unicodedata.normalize("NFC", word):
        d = unicodedata.normalize("NFD", ch)
        if not done and d != ch:
            out.append(d)
            done = True
        else:
            out.append(ch)
    return "".join(out)


def doc(doc_id: int) -> tuple[str, str]:
    n = 5 + (doc_id * 7) % 9
    parts: list[str] = []
    for i in range(n):
        w = WORDS[(doc_id * 13 + i * 5) % len(WORDS)]
        parts.append(variant(w, (doc_id + i) % 6))
        if i < n - 1:
            parts.append(SEPS[(doc_id + i) % len(SEPS)])
    text = "".join(parts)
    return text, unicodedata.normalize("NFC", text)


def main() -> int:
    # Domain check: the operator's Python twin must reproduce real NFC
    # on every doc (the twin is asserted == the Spark expression by
    # tests/test_unicode_nfc.py's differential).
    table_apply = nfc_compose_py

    ids, texts, exps = [], [], []
    for d in range(N_DOCS):
        t, e = doc(d)
        assert table_apply(t) == e, (d, t)
        assert t == t.encode("utf-8").decode("utf-8")
        ids.append(d)
        texts.append(t)
        exps.append(e)
    n_diff = sum(1 for t, e in zip(texts, exps) if t != e)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "exp_nfc": pa.array(exps, pa.string()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(
        f"wrote {OUT}: {table.num_rows} rows ({n_diff} docs differ from "
        f"their NFC form), {os.path.getsize(OUT)} bytes; "
        f"table={len(NFC_COMPOSE_TABLE)} entries + algorithmic Hangul"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
