"""Replicated reference corpus for scale-curve benchmarking.

The C++ reference (``src/tema1.cpp:344-364``) mmap-loads the WHOLE
corpus into RAM before its map phase, so its ceiling is the machine's
memory; the Spark pipeline streams files through tasks and has no such
cap. To demonstrate that on one box, this module materializes the
landed 355-document corpus (``refdata/reference_corpus.parquet``,
6.4 MB of text) replicated ``factor`` times with DISTINCT doc ids —
at factor 64 that is ~410 MB of text, past the point where per-run
fixed overhead dominates, so the wall-clock curve shows the engine's
actual sub-linear scaling. bench.py records the curve in
BENCH_DETAIL.json (``reference_corpus_scale_curve``).

Replication semantics are exact and test-pinned: replica r of document
d gets ``doc_id = d + n_docs * r``, texts are byte-identical, so for
every word ``df_factor(word) == factor * df_1(word)`` and each posting
list is the base list tiled across the replica id ranges
(tests/test_scaled_corpus.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REF_CORPUS_PARQUET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "refdata",
    "reference_corpus.parquet",
)


def _cache_dir(factor: int) -> str:
    return os.path.join(tempfile.gettempdir(), "pmrs_scaled_corpus", f"x{factor}")


def scaled_reference_corpus(
    spark: SparkSession,
    factor: int,
    base_parquet: str = REF_CORPUS_PARQUET,
    n_files: int = 32,
) -> DataFrame:
    """(doc_id, text): the reference corpus replicated ``factor`` times
    with distinct doc ids, materialized ONCE per factor to a temp
    parquet (n_files files so the downstream scan parallelizes) and
    read back from there — generation cost is a build step, never part
    of a timed query. factor=1 reads the landed parquet directly."""
    if factor <= 1:
        return spark.read.parquet(base_parquet).select("doc_id", "text")
    path = _cache_dir(factor)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        base = spark.read.parquet(base_parquet).select("doc_id", "text")
        n_docs = base.count()  # scalar metadata (355 for the reference corpus)
        reps = spark.range(factor).withColumnRenamed("id", "rep")
        (
            base.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.lit(n_docs) * F.col("rep")).alias("doc_id"),
                "text",
            )
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path).select("doc_id", "text")
