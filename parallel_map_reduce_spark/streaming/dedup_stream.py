"""LIVE ingest-time near-dup detection: streaming MinHash-LSH against a
standing corpus index.

The batch twin (`queries/dedup.py:dedup_incremental_lsh`) matches an
increment against the corpus in one shot; production crawls ARRIVE, and
each micro-batch must be checked on ingest. This drain runs that flow:

    document stream -> foreachBatch(
        band-signature the batch's increment docs   (per-doc projection;
                                                     O(|batch|), no state),
        equi-join (band, sig) into the PRE-COMPUTED corpus band table,
        append the colliding pairs to the result store)

The corpus band table is built ONCE before the stream starts and
materialized — the artifact-reuse property the batch operator's 100 TB
note promises (`operators/dedup.py:incremental_lsh_matches`): at scale
it is a persisted table partitioned by (band, sig); the stream side
touches only colliding buckets and the corpus is never re-shingled.

Signatures are deterministic md5-derived arithmetic, so the drained
result equals the batch run exactly and shares its DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_band_signatures


def incremental_matches_against(
    new_docs: DataFrame, corpus_bands: DataFrame
) -> DataFrame:
    """(new_doc, corpus_doc): one micro-batch's collisions against the
    prebuilt corpus band table."""
    nb = lsh_band_signatures(new_docs)
    return (
        nb.alias("n")
        .join(
            corpus_bands.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.sig") == F.col("c.sig")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("c.doc_id").alias("corpus_doc"),
        )
        .distinct()
    )


def run_incremental_lsh_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the document stream through ingest-time LSH matching;
    return all (new_doc, corpus_doc) collisions found across batches."""
    from ..queries.dedup import INCR_SOURCE
    from ..sources.catalog import load_table
    from .curation_stream import read_documents_stream

    docs = load_table(spark, sf_dir, "documents")
    corpus_bands = lsh_band_signatures(
        docs.filter(F.col("source") != INCR_SOURCE)
    ).localCheckpoint(eager=True)  # the standing index artifact

    # Deterministic pid-keyed result dir, cleared up front: repeat runs
    # (bench best-of-N, gate re-runs) reuse ONE directory per process
    # instead of leaking a fresh mkdtemp each invocation. The dir must
    # outlive this call (the returned DataFrame reads it lazily), so
    # it is cleared at the START of the next run, not on exit.
    tag = hashlib.md5(f"lsh:{os.path.abspath(sf_dir)}:{os.getpid()}".encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), "pmrs_lsh_matches", tag)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    empty = spark.createDataFrame([], "new_doc BIGINT, corpus_doc BIGINT")
    empty.write.mode("append").parquet(out_dir)  # schema for the 0-match case

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        inc = batch_df.filter(F.col("source") == INCR_SOURCE).select(
            "doc_id", "text"
        )
        incremental_matches_against(inc, corpus_bands).write.mode(
            "append"
        ).parquet(out_dir)

    # Fresh checkpoint per invocation (a reused one would drain zero
    # batches on repeat runs); removed after the drain completes.
    ckpt = tempfile.mkdtemp(prefix="pmrs_lsh_ckpt_")
    try:
        (
            read_documents_stream(spark, sf_dir)
            .writeStream.foreachBatch(_apply)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
            .awaitTermination()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    # distinct: pair-level idempotence if a batch is ever replayed
    # (foreachBatch is at-least-once without a transactional sink).
    return spark.read.parquet(out_dir).distinct()
