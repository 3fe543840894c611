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


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_session(spark):
    """A session clone configured for the RocksDB state store — the
    100 TB state-size contract for this drain (VERDICT r14 task 5):
    word-keyed posting state grows with VOCABULARY, and the default
    HDFS-backed provider keeps every key on executor heap — an OOM
    ceiling a web-scale index hits long before 100 TB. RocksDB spills
    state to local disk with bounded memory. The provider conf is
    per-session and read at query START, so the engine applies it to
    its own clone at runtime — never relying on the driver's bare
    session carrying any conf (the driver contract)."""
    s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    # newSession resets runtime confs to context defaults; carry the
    # parent's shuffle sizing so the drain's exchanges keep their width.
    try:
        s.conf.set(
            "spark.sql.shuffle.partitions",
            spark.conf.get("spark.sql.shuffle.partitions"),
        )
    except Exception:
        pass
    return s


def drain_rocksdb(stream_df: DataFrame, table_name: str, session) -> DataFrame:
    """availableNow complete-mode drain that REFUSES to pass if the
    RocksDB provider did not actually engage: the provider class is a
    conf Spark would silently ignore if unavailable, so the drain
    checks the query's final progress for RocksDB custom metrics
    (only the RocksDB provider emits them) — a silent fallback to the
    heap-backed store must fail the gate, not masquerade as the
    100 TB configuration."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    state_ops = (progress or {}).get("stateOperators") or []
    custom = state_ops[0].get("customMetrics", {}) if state_ops else {}
    if not any("rocksdb" in k.lower() for k in custom):
        raise RuntimeError(
            "RocksDB state store did not engage for the streaming "
            f"inverted-index drain (metrics: {sorted(custom)[:5]}) — "
            "refusing to serve heap-backed state as the 100 TB config"
        )
    return session.table(table_name)
