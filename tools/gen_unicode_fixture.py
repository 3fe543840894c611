"""Generate the committed UTF-8 text fixture (refdata/unicode_fixture.parquet).

The reference-parity tokenizer is ASCII by contract (``src/tema1.cpp:
88-99`` is ``isalpha``), but the LLM-pipeline text operators meet
real UTF-8 corpora — the Unicode tokenization mode
(operators/tokenize.py:unicode_tokenize) needs a non-ASCII fixture its
DuckDB oracle can independently tokenize. One row per doc_id 0..1999:

    doc_id BIGINT, text VARCHAR, script VARCHAR

Texts are deterministic compositions from per-script word pools —
accented Latin (French/German/Spanish, incl. uppercase forms whose
lowercase is a simple 1:1 mapping), lowercase Greek, Cyrillic (both
cases), CJK (no case; adjacent Han runs form one token, as both
engines agree — no segmentation is claimed), Arabic and Hebrew (no
case) — joined by rotating NON-letter separators (spaces, digits,
punctuation across scripts, emoji) so the ``[^\\p{L}]+`` split has
real work to do.

CONTRACT NOTE (what keeps Spark's Java regex/lower and DuckDB's
RE2/utf8proc in exact agreement — and why certain characters are
deliberately ABSENT): the pools avoid the documented case-mapping
divergences — capital Greek sigma at word end (Java's toLowerCase is
context-sensitive: final Σ → ς; utf8proc is not: σ), Turkish dotted
İ/dotless ı (locale- and normalization-dependent), and anything whose
lowercase changes length (ẞ, titlecase digraphs). Everything kept has
a simple 1:1 lowercase mapping on which both engines agree; the
parity hash match of text_unicode_tokens each round IS the proof the
agreement holds.

Deterministic by construction (no RNG, no time).

Usage: python tools/gen_unicode_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 2000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "unicode_fixture.parquet",
)

POOLS: dict[str, list[str]] = {
    "latin": [
        "café", "naïve", "déjà", "garçon", "über", "straße", "mañana",
        "œuvre", "fjörd", "señor", "crème", "brûlée", "Zürich", "École",
        "pingüino", "ÉTÉ", "smörgåsbord", "piñata", "fação", "łódź",
    ],
    "greek": [
        "αλφα", "βητα", "γαμμα", "δελτα", "λογος", "κοσμος", "φυσις",
        "μηχανη", "γλωσσα", "αριθμος", "ψυχη", "χρονος",
    ],
    "cyrillic": [
        "мир", "слово", "данные", "поток", "Москва", "язык", "буква",
        "Россия", "книга", "ВОДА", "земля", "небо",
    ],
    "cjk": [
        "数据", "处理", "分析", "日本語", "中文", "機械", "学習", "言語",
        "한국어", "데이터", "処理系",
    ],
    "rtl": [
        "سلام", "كتاب", "لغة", "بيانات", "שלום", "ספר", "שפה", "מידע",
    ],
}
SCRIPTS = list(POOLS)

# Non-letter glue between words: ASCII space/digits/punct, full-width
# and script punctuation, an emoji, an Arabic comma — all must vanish
# under the [^\p{L}]+ split on BOTH engines.
SEPARATORS = [" ", ", ", " 42 ", "—", "…", "。", "، ", " 🚀 ", "\t", " 7\n"]


def doc_text(doc_id: int) -> tuple[str, str]:
    """Deterministic (text, script) for one doc: 6-17 words drawn from
    the doc's home pool plus every third word from a rotating foreign
    pool (every doc is mixed-script, like a real crawl)."""
    script = SCRIPTS[doc_id % len(SCRIPTS)]
    home = POOLS[script]
    n_words = 6 + (doc_id * 7) % 12
    parts: list[str] = []
    for i in range(n_words):
        if i % 3 == 2:
            pool = POOLS[SCRIPTS[(doc_id + i) % len(SCRIPTS)]]
        else:
            pool = home
        parts.append(pool[(doc_id * 13 + i * 5) % len(pool)])
        if i < n_words - 1:
            parts.append(SEPARATORS[(doc_id + i) % len(SEPARATORS)])
    return "".join(parts), script


def main() -> int:
    ids, texts, scripts = [], [], []
    for d in range(N_DOCS):
        t, s = doc_text(d)
        assert t == t.encode("utf-8").decode("utf-8")
        ids.append(d)
        texts.append(t)
        scripts.append(s)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "script": pa.array(scripts, pa.string()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows, {os.path.getsize(OUT)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
