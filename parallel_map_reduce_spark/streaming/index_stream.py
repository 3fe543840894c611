"""LIVE streaming inverted-index maintenance — the reference's flagship
workload (src/tema1.cpp map+reduce) as a Structured Streaming job.

The reference builds its index in one batch over a closed corpus; a
production ingest pipeline maintains the index as documents ARRIVE.
Each micro-batch tokenizes its documents with the SAME per-document
fused contract as the batch flagship (``operators/tokenize.
doc_word_pairs`` — pure projection + explode, streaming-safe), and the
posting lists live in streaming aggregation state keyed by word:
state size = |vocabulary| entries x posting lists, exactly the
reducer-side footprint of the batch job, updated incrementally.

Drained with availableNow + complete mode (one micro-batch over the
staged corpus), the final state equals the batch ``inverted_index``
result — so the LIVE run is checked against the very same DuckDB
oracle, closing the loop between the streaming family and the
reference-parity core. At scale: swap the memory sink for a Delta/
Kafka sink in update mode and posting lists append per trigger;
per-word state is bounded by that word's document frequency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.tokenize import doc_word_pairs


def inverted_index_stream(docs: DataFrame) -> DataFrame:
    """(word, df, postings, letter) maintained in streaming state from a
    document stream — same output schema and values as the batch
    flagship query once the stream drains."""
    pairs = doc_word_pairs(docs)
    return (
        pairs.groupBy("word")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.array_join(
                F.sort_array(F.collect_set("doc_id")), " "
            ).alias("postings"),
        )
        .select("word", "df", "postings", F.substring("word", 1, 1).alias("letter"))
    )
