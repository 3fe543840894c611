"""Query registry — the single source of truth for the driver contract.

Each entry couples a Spark query builder ``(spark, sf_dir) -> DataFrame``
with (where expressible) an ANSI-SQL oracle string DuckDB runs on the
same parquet tables. The driver compares row count + schema +
order-insensitive value hash, with columns sorted BY NAME — so every
computed column is aliased identically on both sides.

Conventions to keep the hash compare stable across engines:
- aggregate doubles are rounded to 4 decimals on BOTH sides (float sums
  differ in the last ulps between engines / reduction orders);
- arrays are rendered as space-joined strings;
- timestamps used as group keys are truncated/cast identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate checks exactly the FIRST 50 registered
# entries; GATE_PRIORITY curates that window (mechanics pinned in
# tests/test_registry_contract.py). ROTATION POLICY, applied every
# round:
#   1. The 10 core entries (SURVEY §2.1 reference-parity bar) are
#      permanent.
#   2. Every entry ADDED this round rotates IN immediately, displacing
#      the entries with the longest green hash-match history.
#   3. Every family keeps at least one in-window representative.
#   4. Slow entries (live streaming drains) sit at the END of the
#      window; un-gated drains stay at the registry tail.
# Round-10 window (VERDICT r9 tasks 1+3): similarity_pq_topk and
# event_type_user_overlap_hll rotate OUT (both got their r9 ran-row);
# documents_quality_logreg — the LAST never-driver-checked entry —
# rotates IN, and the second freed slot goes to oracle-backed
# trade_graph_pagerank (graph family regains its pagerank
# representative; the oracle floor rises 47 -> 48).
# embedding_pca_whitened STAYS: its r9 row was a driver-canonicalizer
# crash (raw ARRAY<DOUBLE> output, fixed this round by rendering comps
# as a space-joined string per the convention above) and it needs its
# first CLEAN driver row. Full displacement log: GATE_HISTORY.md.
GATE_PRIORITY: tuple[str, ...] = (
    # core (reference parity) — permanent
    "inverted_index",
    "token_pairs_distinct",
    "token_stream",
    "letter_histogram",
    "index_text_rows",
    "manifest_inverted_index",
    "reference_corpus_index",
    "doc_stats",
    "inverted_index_chunked",
    "documents_provenance",
    # relational — new round 6 (TPC-H pattern representative + bucketed
    # co-located join layout + SCD2 dimension-history build)
    "q4_priority_order_check",
    "bucketed_orders_revenue",
    "orders_status_scd2",
    "basket_part_pairs",
    # events — new round 6 (skew pre-flight diagnostics, incremental
    # aggregate maintenance)
    "events_user_skew_report",
    "events_incremental_agg_merge",
    # approx/ML family rows-only slot (rotation: hll_rollup r6,
    # gk-quantiles r7, SemDeDup r8; PCA-whitening r9 — kept for r10 to
    # earn its first CLEAN driver row after the r9 rendering fix)
    "embedding_pca_whitened",
    # relational — new round 7: WOE/IV feature scoring (the MI/chi2
    # contingency family's credit-scoring sibling)
    "orders_priority_woe_iv",
    # relational / events — new late round 6: lakehouse CDC MERGE,
    # information-theoretic column profiling, grouped OLS trend and
    # exact finite-window EWMA (operators/cdc.py, timeseries.py)
    "orders_cdc_merge",
    "orders_cdc_diff",
    "customer_segment_nation_mi",
    "customer_segment_nation_chi2",
    "events_ab_conversion",
    "events_session_metrics",
    "lineitem_column_profile",
    "events_trend_ols",
    "events_value_holt",
    # events — new round 7: OLS-residual anomaly screen, Markov
    # transition matrix, last-touch revenue attribution
    "events_trend_anomalies",
    "events_type_transitions",
    "events_touch_attribution",
    "events_value_twap",
    # dedup: round-4 never-checked + new rounds 5/6 (the lossless
    # prefix-filtered exact similarity join is a round-6 addition)
    "dedup_jaccard_prefix",
    # dedup — new round 7: exact-substring (span-level) duplication
    "dedup_repeated_substrings",
    # curation rows-only slot (rotation: the PQ-ADC baseline got its r9
    # ran-row; the quality classifier — the last never-driver-checked
    # entry, de-risked by its r9 model sidecar — takes r10)
    "documents_quality_logreg",
    # events / streaming-batch: never-checked + family anchors +
    # round-6 PSI drift monitor
    "events_drift_psi",
    # curation anchors + new rounds 5/6 (weighted sampling)
    "curation_weighted_sample",
    # curation — new round 7: leakage-guarded split over the shared LSH
    # candidate-edge artifact
    "curation_leakage_split",
    # graph: anchor + round-4 never-checked + new round 6 (LPA)
    "trade_graph_communities_lpa",
    "neardup_communities_lpa",
    # search / multimodal anchors; round 7 swapped in the multi-query
    # BM25 serving entry; round 9 ADDS the persisted-index serving twin
    # (oracle-backed — it displaces events_value_ewma, the window's
    # longest-green events representative, per rule 2; the events
    # family keeps 12 in-window entries)
    "search_bm25_multi",
    "search_bm25_served",
    # text — new round 5 (distributed cumulative-distinct curve) +
    # round 6 (sparse tf-idf cosine join, n-gram novelty, CMS sketch);
    # round 10 adds the context-length planning histogram (rule 2 —
    # oracle-backed, displaces funnel_capped_windows, green r6-r10 and
    # the longest-green non-core member; the streaming_batch module
    # keeps 13+ in-window representatives)
    "documents_length_histogram",
    "multimodal_image_resize",
    "text_doc_similarity",
    "text_novelty_ngrams",
    "text_cms_heavy_hitters",
    # oracle-backed slot (r10: the HLL set-overlap entry got its r9
    # ran-row and rotates out; pagerank — green r6 at both SFs — rejoins
    # so the graph family carries its superstep representative and the
    # window's oracle floor rises to 48)
    "trade_graph_pagerank",
    # live streaming drains — oracle-backed, last on purpose
    "streaming_inverted_index",
    "streaming_cdc_apply",
    "streaming_neardup_lsh",
)


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        _REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that register queries.
    from . import queries as _queries  # noqa: F401

    # GATE_PRIORITY first (the driver's 50-entry gate window), then
    # everything else in registration order — which keeps the slow live
    # streaming drains at the tail.
    ordered = {name: _REGISTRY[name] for name in GATE_PRIORITY}
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
