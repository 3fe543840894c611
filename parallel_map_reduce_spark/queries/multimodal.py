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


# Committed binary fixture of REAL image files (PNG/GIF/BMP/JPEG built
# by stdlib struct/zlib — tools/gen_image_fixture.py), one per doc_id,
# with the encode-time dimensions stored as exp_* columns. The Spark
# side PARSES the bytes (multimodal/imagehdr.py); the oracle reads the
# exp_* record of what was encoded — an independent check of the parse.
_IMAGE_FIXTURE_PARQUET = "/root/repo/refdata/image_fixture.parquet"


def _image_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fixture = spark.read.parquet(_IMAGE_FIXTURE_PARQUET).select("doc_id", "payload")
    # Inner join scopes the fixture (doc_id 0..4999) to the sf's docs.
    return fixture.join(docs, "doc_id")


@register(
    "multimodal_image_features",
    oracle=f"""
WITH f AS (
    SELECT doc_id, octet_length(payload) AS n, exp_width, exp_height,
           exp_channels
    FROM read_parquet('{_IMAGE_FIXTURE_PARQUET}')
    WHERE doc_id IN (SELECT doc_id FROM documents)
)
SELECT doc_id, n::BIGINT AS n_bytes,
       exp_width::BIGINT AS width,
       exp_height::BIGINT AS height,
       exp_channels::BIGINT AS channels,
       CAST(exp_width AS DOUBLE) / exp_height AS aspect
FROM f
""",
    doc="REAL image-metadata decode: committed PNG/GIF/BMP/JPEG payloads "
    "(refdata/image_fixture.parquet) → Arrow-batched mapInPandas parsing "
    "width/height/channels from magic bytes (multimodal/imagehdr.py, "
    "stdlib struct/zlib). The oracle reads the encode-time dimensions "
    "recorded by the fixture generator, so parity verifies the parse "
    "against an independent record. Pixel-level decode stays stubbed "
    "(no PIL in this environment; multimodal/codec.py).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _image_payloads(spark, sf_dir).mapInPandas(
        image_features_map, schema=IMAGE_FEATURES_SCHEMA
    )


# Committed WAV fixture — same discipline as the image fixture above:
# real PCM files built by stdlib struct (tools/gen_audio_fixture.py),
# encode-time parameters recorded as exp_* columns the oracle reads.
_AUDIO_FIXTURE_PARQUET = "/root/repo/refdata/audio_fixture.parquet"


@register(
    "multimodal_audio_features",
    oracle=f"""
WITH f AS (
    SELECT doc_id, octet_length(payload) AS n, exp_sample_rate,
           exp_channels, exp_n_frames
    FROM read_parquet('{_AUDIO_FIXTURE_PARQUET}')
    WHERE doc_id IN (SELECT doc_id FROM documents)
)
SELECT doc_id, n::BIGINT AS n_bytes,
       exp_n_frames::BIGINT AS n_frames,
       exp_sample_rate::BIGINT AS sample_rate,
       exp_channels::BIGINT AS channels,
       CAST(exp_n_frames AS DOUBLE) / exp_sample_rate AS duration_s
FROM f
""",
    doc="REAL audio-metadata decode: committed PCM WAV payloads "
    "(refdata/audio_fixture.parquet) → Arrow-batched mapInPandas "
    "parsing sample rate/channels/frame count from the RIFF/fmt/data "
    "chunks (multimodal/audiohdr.py, stdlib struct; builder validated "
    "against the stdlib wave module). The oracle reads the encode-time "
    "record written by the fixture generator, so parity verifies the "
    "parse independently. Sample-level decode stays stubbed (no audio "
    "libs in this environment; multimodal/codec.py).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fixture = spark.read.parquet(_AUDIO_FIXTURE_PARQUET).select("doc_id", "payload")
    return fixture.join(docs, "doc_id").mapInPandas(
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
    oracle=f"""
WITH img AS (
    SELECT doc_id, CAST(exp_width AS DOUBLE) / exp_height AS aspect
    FROM read_parquet('{_IMAGE_FIXTURE_PARQUET}')
),
txt AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '[ \t\n]+'), x -> len(x) > 0))::BIGINT AS n_tokens
    FROM documents
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
