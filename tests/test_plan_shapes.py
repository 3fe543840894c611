"""Physical-plan regression contracts.

Correctness tests can't catch a plan regression (a lost pushdown or a
broadcast that became a shuffle join produces the same rows, slower).
These pin the plan properties the 100 TB design depends on.
"""

from __future__ import annotations

import pytest

from parallel_map_reduce_spark.registry import all_queries


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    specs = all_queries()

    def _plan(name: str) -> str:
        return specs[name].build(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    return _plan


def test_q1_filter_pushdown_and_pruning(plans):
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # projection pruned: the 11-column table reads only the 7 used columns
    assert "l_orderkey" not in p.split("ReadSchema")[1][:400]


def test_q3_broadcasts_dims(plans):
    p = plans("q3_shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in p  # dim filter pushed to scan
    assert p.count("BroadcastHashJoin") >= 1


def test_q5_star_join_broadcasts(plans):
    assert plans("q5_region_revenue").count("BroadcastHashJoin") >= 3


def test_asof_single_exchange(plans):
    p = plans("asof_purchase_last_click")
    assert p.count("Exchange hashpartitioning") == 1, "as-of must stay 1 shuffle"


def test_sessionize_single_exchange(plans):
    assert plans("events_sessionized").count("Exchange hashpartitioning") == 1


def test_scan_speed_ops_have_no_exchange(plans):
    for name in (
        "text_fingerprints",
        "text_winnowing_fingerprints",
        "text_token_counts",
        "text_quality_scores",
        "text_lang_id",
        "text_repetition_signals",
        "curation_stratified_sample",
        "dedup_simhash",
    ):
        p = plans(name)
        assert "Exchange" not in p, f"{name} grew a shuffle"


def test_fixture_decode_entries_broadcast_scoped_no_shuffle(plans):
    """Since the real-decode rewires, every fixture-backed multimodal
    entry joins the committed payload fixture to the sf's documents:
    the scope join must be a BROADCAST (doc-id dim is small), never a
    shuffle."""
    for name in (
        "multimodal_image_features",
        "multimodal_image_resize",
        "multimodal_video_frames",
        "multimodal_audio_loudness",
    ):
        p = plans(name)
        assert "BroadcastHashJoin" in p, f"{name} lost the broadcast scope"
        assert "Exchange hashpartitioning" not in p, f"{name} scope join shuffled"


def test_funnel_single_shuffle(plans):
    """The funnel fold must keep its one-shuffle shape — regressing to
    the join-cascade formulation would triple the shuffles."""
    assert plans("funnel_view_click_purchase").count("Exchange hashpartitioning") == 1


def test_q19_disjunction_pushed_and_broadcast(plans):
    p = plans("q19_brand_size_disjunction")
    # the OR-of-quantity-bounds residue reaches the lineitem scan
    assert "Or(And(GreaterThanOrEqual(l_quantity" in p.replace(
        "Or(Or(And(GreaterThanOrEqual(l_quantity", "Or(And(GreaterThanOrEqual(l_quantity"
    )
    assert p.count("BroadcastHashJoin") >= 1


def test_flagship_single_shuffle(plans):
    """Per-doc array_distinct dedup keeps the flagship at ONE Exchange
    (the postings group-by) — the global dropDuplicates would add a
    second full shuffle of the pair stream."""
    assert plans("inverted_index").count("Exchange hashpartitioning") == 1


def test_events_reads_prune_columns(plans):
    p = plans("event_type_distinct_users")
    read = p.split("ReadSchema")[1][:300]
    assert "props" not in read and "event_id" not in read


def test_ngram_jaccard_bounded_shuffles(plans):
    """Posting-list formulation (r17): the per-doc set size rides the
    exploded shingle rows, so the ONLY shuffles are the shingle
    group-by and the pair count — no separate sizes aggregation (a
    second corpus scan), no size joins at all, and no pair stream is
    ever cross-joined."""
    p = plans("dedup_ngram_jaccard")
    assert "CartesianProduct" not in p
    assert "Join" not in p, "sizes must ride the rows, not join back"
    assert p.count("Exchange hashpartitioning") <= 2
    assert p.count("Scan parquet") == 1, "one corpus scan only"


def test_ann_lsh_no_cartesian(plans):
    p = plans("similarity_ann_lsh")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 1, "query side must broadcast"
    assert p.count("Exchange hashpartitioning") <= 2


def test_ann_ivf_no_cartesian(plans):
    """The only nested-loop joins are broadcasts over the k-row centroid
    table (deliberate); the corpus side must never cartesian-join."""
    p = plans("similarity_ann_ivf")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 1, "probe join must broadcast"


def test_q3_topk_no_exchange_after_agg(plans):
    """Top-k after the revenue agg must be TakeOrderedAndProject (partial
    per-partition top-k + single-driver merge), not a global sort: the
    agg's hashpartitioning Exchange is the plan's only shuffle."""
    p = plans("q3_shipping_priority")
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "Sort [" not in p.split("TakeOrdered")[0], "global sort crept in above top-k"


def test_q7_single_fact_shuffle(plans):
    """Five dims broadcast; the orderkey join is the plan's only
    hashpartitioning Exchange (plus the final agg reuses it via AQE)."""
    p = plans("q7_nation_trade_matrix")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_q18_having_joinback_broadcasts(plans):
    """The HAVING-filtered agg output is small; both join-backs must be
    broadcasts on top of the single l_orderkey shuffle."""
    p = plans("q18_large_orders")
    assert p.count("BroadcastHashJoin") >= 2
    assert p.count("Exchange hashpartitioning") == 1


def test_running_spend_single_shuffle(plans):
    assert plans("customer_running_spend").count("Exchange hashpartitioning") == 1


def test_curation_plan_shapes(plans):
    """Filter chain fuses into the scan: dedup's digest window is the
    pipeline's only shuffle; the split assignment is a pure projection."""
    assert plans("curation_pipeline").count("Exchange hashpartitioning") == 1
    assert "Exchange" not in plans("curation_train_val_split")
    assert plans("curation_pack_bins").count("Exchange hashpartitioning") <= 2
