"""Generate the committed language-ID fixture
(refdata/langid_fixture.parquet) — VERDICT r15 task 7.

Script-ID (text_unicode_script_id) separates ALPHABETS but cannot
tell English from French — or Russian from Ukrainian; the
char-trigram classifier (operators/lang_trigram.py) separates
languages WITHIN a script. This fixture is its labeled corpus: 2000
docs across nine languages (r17, VERDICT r16 task 3: six
Latin-script — en fr de es it pt — plus the Cyrillic same-script
pair ru/uk and Greek el), each doc composed deterministically from
that language's common-word pool — function words carry the bulk of
a language's trigram signature, which is exactly what the
Cavnar–Trenkle profile method keys on. Accented letters are IN
DOMAIN since r17 (the fold class is lowercase BMP letters), so the
French/German/Czech-style diacritics below contribute trigrams.

Every pool is LOWERCASE-ONLY and checked against the pinned
casefold-divergence set (refdata/casefold_divergence.parquet): the
contract lower()s text, and that set is exactly where the three
engines disagree — the generator asserts no pool character is in
it (operators/lang_trigram.py boundary (b)).

``lang`` is composition knowledge (the generator KNOWS which pool it
sampled), never an algorithm output — the oracle re-derives the
classifier in DuckDB and the accuracy-floor pytest scores held-out
docs ((doc_id // 6) % 4 == 3, never used for profile building)
against this column.

Pools deliberately SHARE spellings across languages ("la" fr/es/it,
"de" fr/es/pt, "a"/"no"/"se"; ru/uk share Cyrillic spellings of
common particles) so the task is not trivially separable.

One row per doc_id 0..1999: doc_id BIGINT, lang VARCHAR, text
VARCHAR. Deterministic by construction (no RNG, no time).

Usage: python tools/gen_langid_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 2000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "langid_fixture.parquet",
)

POOLS: dict[str, list[str]] = {
    "en": (
        "the and that with have this from they which were their said "
        "would there people about could other into your some them then "
        "than time only think also after first well where being because "
        "through should never world during things against little"
    ).split(),
    "fr": (
        "le la les des une est pour dans avec qui nous vous être cette "
        "mais comme tout plus leur bien sans deux même faire aussi peut "
        "très autre après notre entre encore toujours quelques pendant "
        "chaque depuis beaucoup était donc leurs choses jamais"
    ).split(),
    "de": (
        "der die das und ist nicht mit für auf ein eine werden haben "
        "sich auch nach wird sind oder aber wenn über noch durch kann "
        "beim diese einem ihre wurde zwischen immer schon gegen unter "
        "doch hier ihren während müssen nichts wieder zusammen"
    ).split(),
    "es": (
        "el los las que en una con por para es no se del como más pero "
        "sus fue este entre cuando todo esta ser son dos también había "
        "era muy años hasta desde está porque sobre donde mismo ahora "
        "cada vida menos mundo siempre durante"
    ).split(),
    "it": (
        "il lo la gli che di per con una sono nel alla come non più "
        "anche questo della hanno essere sua dalla quando molto dopo "
        "tutti ancora fatto sempre loro prima stato senza ogni anni "
        "cosa tempo nostra perché grande queste proprio"
    ).split(),
    "pt": (
        "o os as um uma de que em para com não por mais como mas foi "
        "ele seu sua ou quando muito nos já está eu também só pelo "
        "pela até isso ela entre depois sem mesmo aos seus quem nas "
        "me esse eles você essa num"
    ).split(),
    "ru": (
        "и в не на что это как его она они мы вы был быть этот так "
        "уже или если чтобы когда только все есть может быть очень "
        "теперь после здесь между собой жизнь время человек мир"
    ).split(),
    "uk": (
        "і в не на що це як його вона вони ми ви був бути цей так "
        "вже або якщо щоб коли тільки всі є може дуже тепер після "
        "тут між собою життя час людина україна мова"
    ).split(),
    "el": (
        "και το να του την με για από τον στο δεν είναι που θα μια "
        "τους αυτό ήταν όπως μετά πριν κάθε χωρίς μέσα πάνω κάτω "
        "τώρα εδώ εκεί ζωή χρόνος άνθρωπος κόσμος"
    ).split(),
}
LANGS = sorted(POOLS)


def _assert_pools_avoid_divergence() -> None:
    """Boundary (b) of the trigram contract: no pool character may be
    in the pinned three-engine casefold-divergence set."""
    div_path = os.path.join(os.path.dirname(OUT), "casefold_divergence.parquet")
    div = set("".join(pq.read_table(div_path).column("ch").to_pylist()))
    for lang, pool in POOLS.items():
        bad = div & set("".join(pool))
        assert not bad, f"{lang} pool hits casefold-divergence chars {bad!r}"


def doc(doc_id: int) -> tuple[str, str]:
    lang = LANGS[doc_id % len(LANGS)]
    pool = POOLS[lang]
    n = 30 + (doc_id * 7) % 31
    words = [pool[(doc_id * 13 + i * 5 + i * i) % len(pool)] for i in range(n)]
    # sprinkle digits/punctuation the trigram contract folds away
    if doc_id % 4 == 1:
        words.insert(n // 2, str(1900 + doc_id % 120))
    text = " ".join(words)
    if doc_id % 5 == 2:
        text = text.replace(" ", ", ", 1)
    return lang, text


def main() -> int:
    _assert_pools_avoid_divergence()
    ids, langs, texts = [], [], []
    for d in range(N_DOCS):
        lg, t = doc(d)
        ids.append(d)
        langs.append(lg)
        texts.append(t)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(
        f"wrote {OUT}: {table.num_rows} rows, {len(LANGS)} languages, "
        f"{os.path.getsize(OUT)} bytes"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
