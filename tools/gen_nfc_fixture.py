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

Domain discipline: every decomposed sequence emitted is the full NFD
form of a character in operators/unicode_norm.py:NFC_DOMAIN (verified
at generation time); partially-composed forms (e.g. precomposed
diaeresis + combining tonos) are OUT of the documented domain and
never emitted. Deterministic by construction (no RNG, no time).

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
    NFC_DOMAIN,
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
]
SEPS = [" ", ", ", " — ", " 7 ", "。", " 🚀 ", "\t"]


def variant(word: str, mode: int) -> str:
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
        parts.append(variant(w, (doc_id + i) % 3))
        if i < n - 1:
            parts.append(SEPS[(doc_id + i) % len(SEPS)])
    text = "".join(parts)
    return text, unicodedata.normalize("NFC", text)


def main() -> int:
    # Domain check: the fixed table must reproduce real NFC on every doc.
    def table_apply(s: str) -> str:
        for dec, pre in NFC_COMPOSE_TABLE:
            s = s.replace(dec, pre)
        return s

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
        f"their NFC form), {os.path.getsize(OUT)} bytes; domain={NFC_DOMAIN}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
