"""Retrieval operators: phrase matching semantics on constructed docs."""

from __future__ import annotations

from parallel_map_reduce_spark.operators.search import bm25_scores, phrase_search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_phrase_three_terms_and_overlaps(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c x a b c"),      # two disjoint matches of "a b c"
            (2, "a a a a"),            # overlapping matches of "a a a" -> 2
            (3, "a b x c"),            # no match (not adjacent)
            (4, "c b a"),              # no match (wrong order)
        ],
    )
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, ("a", "b", "c")).collect()}
    assert got == {1: 2}
    got2 = {r.doc_id: r.n_matches for r in phrase_search(docs, ("a", "a", "a")).collect()}
    assert got2 == {2: 2}


def test_phrase_case_and_punct_normalized(spark):
    """The query goes through the same tokenization contract as the
    index: case folded, non-alpha stripped."""
    docs = _docs(spark, [(1, "The QUICK, brown fox!"), (2, "quick fox")])
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, ("quick", "brown")).collect()}
    assert got == {1: 1}


def test_bm25_rare_term_outranks_common(spark):
    """A doc matching the rare term must outscore a doc matching only
    the ubiquitous term (idf dominance)."""
    docs = _docs(
        spark,
        [
            (1, "common rare"),
            (2, "common"),
            (3, "common"),
            (4, "common"),
        ],
    )
    scores = {r.doc_id: r.score for r in bm25_scores(docs, ("common", "rare")).collect()}
    assert scores[1] > scores[2] == scores[3] == scores[4]


def test_bm25_served_equals_fresh_build_and_bucket_prunes(spark, sf_dir):
    """The persisted-index serving path must return EXACTLY the fresh
    build's ranking (same DECIMAL per-term reduction → bit-identical
    scores), and its tf scans must bucket-prune to the query terms'
    buckets — the point of paying the word-bucketed layout at write
    time (SelectedBucketsCount strictly below the bucket count)."""
    import re

    from parallel_map_reduce_spark.queries.search import (
        BM25_QUERY_BATCH,
        _MULTI_K,
        _bm25_index_tables,
    )
    from parallel_map_reduce_spark.operators import search as SE
    from parallel_map_reduce_spark.sources.catalog import load_table

    tf, dl = _bm25_index_tables(spark, sf_dir)
    served = SE.bm25_rank_batch(tf, dl, BM25_QUERY_BATCH, k=_MULTI_K)
    fresh = SE.bm25_topk_multi(
        load_table(spark, sf_dir, "documents"), BM25_QUERY_BATCH, k=_MULTI_K
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, fresh.collect())
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    counts = [
        int(m) for m in re.findall(r"SelectedBucketsCount: (\d+) out of", plan)
    ]
    assert counts, "index tf scan is not bucket-pruned:\n" + plan
    assert all(c < 16 for c in counts), counts
