"""Multimodal-column queries: binary payload → mapInPandas feature
extraction, with oracles over the same deterministic arithmetic
(multimodal/codec.py). The payload here is the document text encoded to
UTF-8 bytes — a stand-in for real image/audio blobs; the Spark plumbing
(binary column, Arrow batches, typed output schema) is the real thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.codec import (
    AUDIO_FEATURES_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    audio_features_map,
    image_features_map,
)
from ..registry import register
from ..sources.catalog import load_table


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


@register(
    "multimodal_image_features",
    oracle="""
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id, n::BIGINT AS n_bytes,
       (n % 640 + 1)::BIGINT AS width,
       (n % 480 + 1)::BIGINT AS height,
       3::BIGINT AS channels,
       CAST(n % 640 + 1 AS DOUBLE) / (n % 480 + 1) AS aspect
FROM b
""",
    doc="Image-decode pipeline plumbing: binary payload → Arrow-batched "
    "mapInPandas → typed features (decode itself stubbed; see "
    "multimodal/codec.py).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_payload(spark, sf_dir).mapInPandas(
        image_features_map, schema=IMAGE_FEATURES_SCHEMA
    )


@register(
    "multimodal_audio_features",
    oracle="""
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id, n::BIGINT AS n_bytes,
       (n // 1024 + 1)::BIGINT AS n_frames,
       16000::BIGINT AS sample_rate,
       CAST((n // 1024 + 1) * 1024 AS DOUBLE) / 16000.0 AS duration_s
FROM b
""",
    doc="Audio frame-sampling plumbing: binary payload → mapInPandas → "
    "frame counts/duration (decode stubbed).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_payload(spark, sf_dir).mapInPandas(
        audio_features_map, schema=AUDIO_FEATURES_SCHEMA
    )
