"""LIVE multimodal ingest drain: the streamed decode must equal the
batch multimodal_image_features result row-for-row (same Arrow body,
same fixture, stream-static scoping) — plus the stateless-plan
contract: a per-row decode drain carries no aggregation state.
"""

from __future__ import annotations


def test_streamed_decode_equals_batch(spark):
    from parallel_map_reduce_spark.queries.multimodal import (
        multimodal_image_features,
    )
    from parallel_map_reduce_spark.queries.streaming_live import (
        streaming_multimodal_features,
    )

    sf = "/root/testdata/sf0.001"
    batch = sorted(map(tuple, multimodal_image_features(spark, sf).collect()))
    live = sorted(map(tuple, streaming_multimodal_features(spark, sf).collect()))
    assert live == batch
    assert len(live) == 500


def test_stream_plan_is_stateless(spark):
    """The decode drain must not grow aggregation state: no
    StateStore/aggregation operators in the streaming plan — the
    stream-static join is a broadcast, the decode a projection."""
    from parallel_map_reduce_spark.sources.catalog import load_table
    from parallel_map_reduce_spark.streaming import multimodal_stream as MS

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    stream = MS.image_features_stream(MS.read_image_payload_stream(spark), docs)
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "Aggregate" not in plan
    assert stream.isStreaming
