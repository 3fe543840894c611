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

Domain discipline (r16, widened table): every emitted text is asserted
at generation time to normalize identically under the operator's
Python twin (``nfc_compose_py`` — the exact mirror of the Spark
codegen expression) and real ``unicodedata`` NFC; DuckDB's utf8proc
``nfc_normalize`` is the third implementation, checked in parity. The
word pool now covers the full generated table's breadth: Vietnamese
stacked diacritics (Latin Extended Additional), polytonic Greek
(Greek Extended), Hangul (full-jamo NFD AND partially-composed
LV-syllable + T-jamo forms — both algorithmic composition paths),
Indic two-part vowels (Bengali/Tamil, whose decompositions start with
spacing marks), a supplementary-plane letter (surrogate-safe split),
and the original Latin/Greek/Cyrillic set. Discontiguous-mark
sequences remain OUT of the documented domain and are never emitted.
Deterministic by construction (no RNG, no time).

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
        parts.append(variant(w, (doc_id + i) % 4))
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
