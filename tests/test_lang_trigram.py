"""Char-trigram language ID (operators/lang_trigram.py +
text_lang_trigram_id).

The parity oracle proves Spark == DuckDB on the full train+score
pipeline (all-integer, so the hash covers every prediction AND
distance); these tests pin the parts a hash cannot: held-out
accuracy, the boundary behaviors, and fixture regeneration.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from parallel_map_reduce_spark.operators.lang_trigram import (
    PROFILE_K,
    classify,
    doc_trigrams,
    language_profiles,
)

FIXTURE = "/root/repo/refdata/langid_fixture.parquet"


def _fixture_df(spark):
    from parallel_map_reduce_spark.sources.catalog import read_parquet

    return read_parquet(spark, FIXTURE)


def test_heldout_accuracy_floor(spark):
    """Docs with (doc_id // 6) % 4 == 3 never build profiles; the
    classifier must still call >= 95% of them correctly — the
    generalization floor that separates a classifier from a lookup."""
    out = classify(_fixture_df(spark)).collect()
    held = [r for r in out if (r.doc_id // 6) % 4 == 3]
    assert len(held) >= 400  # a quarter of 2000, spread over 6 langs
    acc = sum(1 for r in held if r.pred_lang == r.lang) / len(held)
    assert acc >= 0.95, f"held-out accuracy {acc:.3f}"
    # and the training split itself is near-perfect
    train = [r for r in out if (r.doc_id // 6) % 4 != 3]
    tacc = sum(1 for r in train if r.pred_lang == r.lang) / len(train)
    assert tacc >= 0.98, f"train accuracy {tacc:.3f}"


def test_all_six_languages_predicted(spark):
    out = classify(_fixture_df(spark)).collect()
    assert {r.pred_lang for r in out} == {"en", "fr", "de", "es", "it", "pt"}


def test_profiles_are_metadata_sized(spark):
    profiles = language_profiles(doc_trigrams(_fixture_df(spark)))
    rows = profiles.collect()
    assert len(rows) <= 6 * PROFILE_K
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.r)
    for lang, ranks in per_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang


def test_boundary_trigrams_and_folding(spark):
    """Word-boundary trigrams exist; digits/punctuation fold to one
    space; accents fold (documented [a-z] domain)."""
    df = spark.createDataFrame(
        [(0, "xx", "The 42, café!")], "doc_id long, lang string, text string"
    )
    grams = {r.g for r in doc_trigrams(df).collect()}
    assert " th" in grams and "he " in grams  # padded boundaries
    assert "caf" in grams and "af " in grams  # é folded to space
    assert not any(c.isdigit() or c in ",!" for g in grams for c in g)


def test_non_latin_text_yields_no_trigrams(spark):
    """Cross-script routing is script-ID's job — documented boundary:
    non-Latin text produces zero [a-z] trigrams here."""
    df = spark.createDataFrame(
        [(0, "ru", "кириллица без латиницы")], "doc_id long, lang string, text string"
    )
    assert doc_trigrams(df).count() == 0


def test_fixture_regenerates_identically():
    import tools.gen_langid_fixture as G

    committed = pq.read_table(FIXTURE)
    ids = committed.column("doc_id").to_pylist()
    langs = committed.column("lang").to_pylist()
    texts = committed.column("text").to_pylist()
    assert len(ids) == G.N_DOCS
    for d in (0, 1, 17, 512, 1999):
        lg, t = G.doc(d)
        i = ids.index(d)
        assert (langs[i], texts[i]) == (lg, t)
