"""Partition-count invariance for the order-free-exactness entries.

The new decimal-discipline operators claim their reductions are exact
in ANY reduction order (BIGINT/DECIMAL sums; floats only in fixed-shape
scalar expressions or per-step-quantized recursions). The sharpest
local falsifier: run each query under a radically different shuffle
partitioning and require BIT-IDENTICAL results — float-sum
formulations fail this under reassociation, these must not. (The
flagship index has the same sweep in tests/test_golden_reference.py;
this extends it to the round-6 session-2 families.)
"""

from __future__ import annotations

import pytest

from parallel_map_reduce_spark.registry import all_queries

ENTRIES = [
    "events_trend_ols",
    "events_value_ewma",
    "events_value_holt",
    "orders_cdc_merge",
    "customer_segment_nation_mi",
    # round 7: the residual screen and the WOE/IV profile make the same
    # order-free claim (DECIMAL sums + fixed-shape libm-rounded terms)
    "events_trend_anomalies",
    "orders_priority_woe_iv",
    "search_bm25_multi",
    "curation_leakage_split",
    "dedup_repeated_substrings",
    # session 2: both are one-user_id-exchange window walks whose only
    # float is a fixed-shape rounded ratio / DECIMAL-cast sum
    "events_type_transitions",
    "events_touch_attribution",
    # DECIMAL(value) x BIGINT(gap) products summed exactly
    "events_value_twap",
    # round 8: LPA over the bucketed edge artifact is integer-exact
    # (BIGINT neighbor-label counts, total-order min_by tie-breaks) —
    # community labels must not depend on shuffle partitioning.
    # PageRank is deliberately absent: raw ranks are float sums (the
    # registry entry's 6 dp rounding is the gate's contract, not bit
    # identity).
    "trade_graph_communities_lpa",
    "neardup_communities_lpa",
    # round 11 session 3: real-decode entries are integer-exact (pixel
    # CRCs, int64 loudness sums, container offsets) with only
    # fixed-shape floats (rms/duration/aspect) — per-row pure decodes
    # must not depend on how payload rows land in partitions.
    "multimodal_image_resize",
    "multimodal_video_frames",
    "multimodal_video_features",
    "multimodal_audio_loudness",
]


@pytest.mark.parametrize("name", ENTRIES)
def test_bit_identical_across_shuffle_partitionings(spark, sf_dir, name):
    spec = all_queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, spec.build(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(tuple, spec.build(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
