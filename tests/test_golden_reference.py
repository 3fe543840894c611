"""End-to-end golden parity against the reference's OWN test corpus.

The reference's oracle is `diff -w` of 26 letter files produced from 355
public-domain book chapters (reference ``checker/checker.sh:22-41``,
corpus ``checker/test_in/``, goldens ``checker/test_out/``). This test
runs the manifest source → inverted index → letter-file sink on that
exact corpus and compares every file — the single most faithful parity
check available (exercises SURVEY.md §2.1 ops 1, 2, 5-8, 11-16 at once).

Also: the reference checker's determinism invariant (identical output
for all 9 M×R configs, ``checker/checker.sh:141-247``) translated to
Spark — identical letter files under different shuffle-partition counts.
"""

from __future__ import annotations

import os
import string

import pytest

from parallel_map_reduce_spark.operators.inverted_index import inverted_index
from parallel_map_reduce_spark.sinks.text_sink import write_letter_files
from parallel_map_reduce_spark.sources.catalog import load_table
from parallel_map_reduce_spark.sources.text_manifest import read_manifest_documents

REF_MANIFEST = "/root/reference/checker/test.txt"
REF_GOLDEN_DIR = "/root/reference/checker/test_out"
REF_SMALL_MANIFEST = "/root/reference/checker/test_small.txt"
REF_SMALL_GOLDEN_DIR = "/root/reference/checker/test_out_small"

needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_MANIFEST), reason="reference corpus not present"
)


def _read_lines(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8", errors="replace") as fh:
        # diff -w semantics: whitespace-insensitive WITHIN a line, but
        # keep blank lines in place — diff -w still flags a spurious or
        # missing line, so dropping empties here would be laxer than the
        # reference checker.
        return [" ".join(ln.split()) for ln in fh.read().splitlines()]


def _diff_letter_files(out_dir: str, golden_dir: str) -> list[str]:
    problems = []
    for letter in string.ascii_lowercase:
        got = _read_lines(os.path.join(out_dir, f"{letter}.txt"))
        want = _read_lines(os.path.join(golden_dir, f"{letter}.txt"))
        if got != want:
            for i, (g, w) in enumerate(zip(got, want)):
                if g != w:
                    problems.append(f"{letter}.txt line {i}: got {g!r} want {w!r}")
                    break
            if len(got) != len(want):
                problems.append(f"{letter}.txt: {len(got)} lines vs golden {len(want)}")
    return problems


@needs_reference
def test_small_fixture_golden(spark, tmp_path):
    docs = read_manifest_documents(spark, REF_SMALL_MANIFEST)
    out = str(tmp_path / "small_out")
    write_letter_files(inverted_index(docs), out)
    problems = _diff_letter_files(out, REF_SMALL_GOLDEN_DIR)
    assert not problems, problems[:10]


@needs_reference
def test_full_corpus_golden(spark, tmp_path):
    """The reference checker's main oracle: 355 chapters → 26 golden files
    (33,262 lines)."""
    docs = read_manifest_documents(spark, REF_MANIFEST)
    out = str(tmp_path / "full_out")
    write_letter_files(inverted_index(docs), out)
    problems = _diff_letter_files(out, REF_GOLDEN_DIR)
    assert not problems, problems[:10]


@needs_reference
def test_determinism_across_parallelism(spark, tmp_path, sf_dir):
    """Reference invariant: output independent of M×R (checker.sh:141-247).
    Spark translation: letter files identical under shuffle.partitions
    ∈ {1, 8, 32} and differing input splits."""
    docs = load_table(spark, sf_dir, "documents")
    outputs = {}
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in (1, 8, 32):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            out = str(tmp_path / f"p{n}")
            write_letter_files(inverted_index(docs.repartition(max(n // 4, 1))), out)
            outputs[n] = {
                letter: _read_lines(os.path.join(out, f"{letter}.txt"))
                for letter in string.ascii_lowercase
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert outputs[1] == outputs[8] == outputs[32]
