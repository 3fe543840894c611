"""Multimodal-column queries: binary payload → mapInPandas feature
extraction, with oracles over the same deterministic arithmetic
(multimodal/codec.py). The payload here is the document text encoded to
UTF-8 bytes — a stand-in for real image/audio blobs; the Spark plumbing
(binary column, Arrow batches, typed output schema) is the real thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import codec as MM
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


@register(
    "multimodal_image_resize",
    oracle=f"""
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
d AS (
    SELECT doc_id, (n % 640 + 1) AS w, (n % 480 + 1) AS h,
           greatest(n % 640 + 1, n % 480 + 1) AS long_edge
    FROM b
)
SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
       ((w * {MM.RESIZE_TARGET}) // long_edge)::BIGINT AS out_width,
       ((h * {MM.RESIZE_TARGET}) // long_edge)::BIGINT AS out_height,
       (((w * {MM.RESIZE_TARGET}) // long_edge) * ((h * {MM.RESIZE_TARGET}) // long_edge) * 3)::BIGINT AS out_pixels
FROM d
""",
    doc="Resize-to-fit plumbing: aspect-preserving integer resize of the "
    "fake-decoded dims via mapInPandas (real decode stubbed; "
    "multimodal/codec.py:resize_map).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_payload(spark, sf_dir).mapInPandas(
        MM.resize_map, schema=MM.RESIZE_SCHEMA
    )


@register(
    "multimodal_video_frames",
    oracle=f"""
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       unnest(range(0, n // {MM.VIDEO_FRAME_BYTES} + 1, {MM.VIDEO_SAMPLE_EVERY}))::BIGINT AS frame_idx,
       (unnest(range(0, n // {MM.VIDEO_FRAME_BYTES} + 1, {MM.VIDEO_SAMPLE_EVERY})) * {MM.VIDEO_FRAME_BYTES})::BIGINT AS byte_offset
FROM b
""",
    doc="Frame-sampling plumbing (one-to-many mapInPandas): every "
    f"{MM.VIDEO_SAMPLE_EVERY}th frame of a {MM.VIDEO_FRAME_BYTES}-byte-"
    "frame payload (multimodal/codec.py:video_frames_map).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_payload(spark, sf_dir).mapInPandas(
        MM.video_frames_map, schema=MM.VIDEO_FRAMES_SCHEMA
    )


@register(
    "multimodal_curation_filter",
    oracle="""
WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
img AS (
    SELECT doc_id,
           CAST(n % 640 + 1 AS DOUBLE) / (n % 480 + 1) AS aspect
    FROM b
),
txt AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '[ \t\n]+'), x -> len(x) > 0))::BIGINT AS n_tokens
    FROM b
)
SELECT i.doc_id, t.n_tokens, i.aspect
FROM img i JOIN txt t ON t.doc_id = i.doc_id
WHERE t.n_tokens >= 20 AND i.aspect BETWEEN 1.0 AND 1.4
""",
    doc="Cross-modal curation: keep documents passing BOTH the text "
    "floor (>= 20 tokens) and an image-geometry gate (aspect in "
    "[1.0, 1.4]) — the text side runs JVM-side at scan speed, the "
    "image side through the Arrow mapInPandas decode path, joined on "
    "doc_id. The shape of every multimodal training-data filter: "
    "modality features computed in their own pipelines, combined "
    "declaratively.",
    tags=("multimodal", "curation", "join"),
)
def multimodal_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import token_counts

    img = multimodal_image_features(spark, sf_dir)  # register() returns fn as-is
    toks = token_counts(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.col("n_ws_tokens").alias("n_tokens")
    )
    return (
        img.select("doc_id", "aspect")
        .join(toks, "doc_id")
        .filter((F.col("n_tokens") >= 20) & F.col("aspect").between(1.0, 1.4))
        .select("doc_id", "n_tokens", "aspect")
    )
