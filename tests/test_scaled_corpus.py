"""Scale-curve corpus replication: exact df/postings semantics.

The replicated corpus exists to measure throughput scaling, but its
construction has a sharp correctness contract worth pinning: replica r
of document d is byte-identical text under ``doc_id = d + n_docs*r``,
so the factor-N inverted index is fully determined by the factor-1
index — every word's df multiplies by N and its posting list is the
base list tiled across replica ranges. A replication bug (id
collisions, text truncation, dropped replicas) breaks these equalities
immediately, which would silently invalidate the bench curve.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_map_reduce_spark.operators.inverted_index import inverted_index
from parallel_map_reduce_spark.sources.scaled_corpus import scaled_reference_corpus

FACTOR = 2


def test_scaled_corpus_ids_and_df_scale_exactly(spark, tmp_path):
    base = scaled_reference_corpus(spark, 1)
    n_docs = base.count()
    # Build factor-2 inline (small enough to not need the temp cache):
    reps = spark.range(FACTOR).withColumnRenamed("id", "rep")
    scaled = base.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.lit(n_docs) * F.col("rep")).alias("doc_id"), "text"
    )
    assert scaled.count() == FACTOR * n_docs
    assert scaled.select("doc_id").distinct().count() == FACTOR * n_docs

    base_idx = {
        r.word: (r.df, list(r.postings))
        for r in inverted_index(base).collect()
    }
    scaled_idx = {
        r.word: (r.df, list(r.postings))
        for r in inverted_index(scaled).collect()
    }
    assert set(scaled_idx) == set(base_idx)
    for word, (df1, post1) in base_idx.items():
        df_n, post_n = scaled_idx[word]
        assert df_n == FACTOR * df1, word
        expected = sorted(
            d + n_docs * rep for rep in range(FACTOR) for d in post1
        )
        assert post_n == expected, word
