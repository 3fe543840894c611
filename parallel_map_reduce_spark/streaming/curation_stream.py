"""LIVE streaming curation: the ingest-side of the training-data
pipeline as a Structured Streaming job.

Batch curation (``operators/curation.py``) assumes the corpus is
already landed; a production pipeline curates documents AS THEY ARRIVE:
quality-filter each micro-batch at scan speed, then suppress duplicate
content via streaming state keyed on the content digest. This module is
that pipeline over the file source (swap for Kafka in production — the
plan below the source is identical).

State story at 100 TB/day: the digest-dedup state holds one key per
UNIQUE surviving document. Content digests have no event-time, so no
watermark can bound this state (unlike ``dedup_keys_stream``) — the
honest production contract is a TTL'd state store or periodic compaction
against the landed corpus (the batch ``dedup_incremental_lsh`` path);
dropDuplicates here is the exact form, documented as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.curation import ALPHA_NUM, MIN_TOKENS, _n_ws_tokens
from .events_stream import _staging_dir

DOCUMENTS_RAW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import _ensure_session_confs

    _ensure_session_confs(spark)
    return spark.readStream.schema(DOCUMENTS_RAW_SCHEMA).parquet(
        _staging_dir(sf_dir, "documents")
    )


def curation_stream(docs: DataFrame) -> DataFrame:
    """(digest): unique content digests of documents surviving the
    quality floor (>= MIN_TOKENS tokens, alpha ratio >= 1/ALPHA_NUM) —
    the same integer-exact predicates as the batch chain, fused into
    the micro-batch scan, then first-seen digest suppression in
    streaming state. Digest-only output makes the availableNow drain
    deterministic (which physical copy arrived first is immaterial)."""
    scored = docs.select(
        F.md5("text").alias("digest"),
        _n_ws_tokens().cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("nc"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
    ).filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_alpha") * ALPHA_NUM >= F.col("nc"))
    )
    return scored.select("digest").dropDuplicates(["digest"])
