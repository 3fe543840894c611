"""Golden-fixture tests for the flagship inverted-index pipeline.

The DuckDB oracle hash is order-insensitive, so the reference's ordering
contract (df desc, word asc within letter; ascending postings;
``word:[ids]`` format — reference src/tema1.cpp:110-115,227,240-247) is
verified here against the verbatim small fixture from FIXTURES.md §3
(reference checker/test_in_small + checker/test_out_small).
"""

import os

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators import (
    doc_word_pairs,
    inverted_index,
)
from parallel_map_reduce_spark.operators.inverted_index import (
    format_index_rows,
    rank_within_letter,
)
from parallel_map_reduce_spark.sinks import write_letter_files

FIXTURE = [
    (1, "The bright sun shines in the blue sky as birds are singing today."),
    (2, "This calm morning, the sky is blue, and gentle clouds float by."),
    (3, "In the peaceful evening, the stars shine brightly in the quiet sky."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(FIXTURE, schema="doc_id BIGINT, text STRING")


def test_distinct_pairs_semantics(spark, docs):
    pairs = doc_word_pairs(docs).collect()
    seen = {(r.word, r.doc_id) for r in pairs}
    assert len(pairs) == len(seen)  # distinct
    # 'the' appears multiple times in doc 1 but once as a pair
    assert ("the", 1) in seen and ("the", 2) in seen and ("the", 3) in seen
    # punctuation stripped: 'morning,' -> 'morning'
    assert ("morning", 2) in seen
    assert all(w.isalpha() and w == w.lower() for w, _ in seen)


def test_postings_order_and_df(spark, docs):
    idx = {r.word: r for r in inverted_index(docs).collect()}
    assert idx["the"].postings == [1, 2, 3]
    assert idx["the"].df == 3
    assert idx["blue"].postings == [1, 2]
    assert idx["sky"].postings == [1, 2, 3]
    assert idx["blue"].letter == "b"
    # 27 distinct words per FIXTURES.md §3
    assert len(idx) == 27


def test_letter_ordering_golden(spark, docs):
    """Within letter b: blue (df=2) first, then freq-1 words alpha asc."""
    rows = format_index_rows(rank_within_letter(inverted_index(docs)))
    b_lines = [r.line for r in rows.filter(F.col("letter") == "b").toLocalIterator()]
    assert b_lines == [
        "blue:[1 2]",
        "birds:[1]",
        "bright:[1]",
        "brightly:[3]",
        "by:[2]",
    ]
    t_lines = [r.line for r in rows.filter(F.col("letter") == "t").toLocalIterator()]
    assert t_lines == ["the:[1 2 3]", "this:[2]", "today:[1]"]


def test_letter_files_sink(spark, docs, tmp_path):
    out = str(tmp_path / "index_out")
    write_letter_files(inverted_index(docs), out)
    with open(os.path.join(out, "b.txt")) as fh:
        assert fh.read().splitlines() == [
            "blue:[1 2]",
            "birds:[1]",
            "bright:[1]",
            "brightly:[3]",
            "by:[2]",
        ]
    with open(os.path.join(out, "a.txt")) as fh:
        assert fh.read().splitlines() == ["and:[2]", "are:[1]", "as:[1]"]
    # letters with no words -> empty files exist (reference opens all 26)
    with open(os.path.join(out, "z.txt")) as fh:
        assert fh.read() == ""


def test_tokenizer_edge_cases(spark):
    docs = spark.createDataFrame(
        [(1, "don't well-known Hello, 123 A\tB\nC  x")],
        schema="doc_id BIGINT, text STRING",
    )
    words = sorted(r.word for r in doc_word_pairs(docs).collect())
    assert words == ["a", "b", "c", "dont", "hello", "wellknown", "x"]


def test_flagship_on_testdata(spark, sf_dir):
    from parallel_map_reduce_spark.plans.flagship import flagship_inverted_index

    idx = flagship_inverted_index(spark, sf_dir)
    n = idx.count()
    assert n > 0
    row = idx.filter(F.size("postings") > 1).first()
    assert row.postings == sorted(row.postings)


def test_chunked_postings_reassemble(spark, sf_dir):
    """Chunk concatenation must reproduce build_postings exactly."""
    from parallel_map_reduce_spark.operators.inverted_index import (
        build_postings,
        build_postings_chunked,
        postings_from_chunks,
    )
    from parallel_map_reduce_spark.operators.tokenize import doc_word_pairs
    from parallel_map_reduce_spark.sources.catalog import load_table

    pairs = doc_word_pairs(load_table(spark, sf_dir, "documents")).cache()
    full = {
        (r.word, tuple(r.postings), r.df, r.letter)
        for r in build_postings(pairs).collect()
    }
    # chunk_size=7 → many chunks per word at any scale
    reassembled = {
        (r.word, tuple(r.postings), r.df, r.letter)
        for r in postings_from_chunks(build_postings_chunked(pairs, chunk_size=7)).collect()
    }
    assert full == reassembled and len(full) > 0


def test_single_partition_order_path_identical_rows(spark, docs):
    """rank_within_letter(num_partitions=1) — the small-corpus path
    that skips the range-boundary sampling job — must produce the
    exact same total order as the scale-out range partitioning."""
    idx = inverted_index(docs)
    ranged = [
        (r.letter, r.line) for r in format_index_rows(rank_within_letter(idx)).collect()
    ]
    single = [
        (r.letter, r.line)
        for r in format_index_rows(rank_within_letter(idx, 1)).collect()
    ]
    assert single == ranged and len(single) == 27


def test_single_partition_order_path_plan_shape(spark, docs):
    """The num_partitions=1 path must pay exactly ONE exchange (the
    word-keyed aggregate) — no RangePartitioning, no sampling, just a
    narrow coalesce into the final ordering task."""
    df = format_index_rows(rank_within_letter(inverted_index(docs), 1))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Coalesce" in plan, plan
