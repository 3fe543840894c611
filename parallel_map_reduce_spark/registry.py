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

LAZINESS CONTRACT (r12, closing the r11 "eager build()" finding):
``build`` must be PLAN-ONLY — constructing a query launches no Spark
jobs, so ``explain``-style tooling over the whole registry runs in
milliseconds. Entries that reuse a multi-referenced intermediate pin it
with ``pin()`` below (lazy ``persist()``: the subplan computes once at
the query's FIRST action and later references hit the cache — same
single-computation guarantee ``localCheckpoint(eager=True)`` gave,
without the construction-time job). Long-lived callers that build many
queries (bench.py) call ``release_pins()`` between queries so cached
blocks never accumulate. The only permitted eager builds are inherently
so — iterative fixpoints (pagerank, connected components, BPE),
cardinality guards that must REFUSE to run, and cold-cache artifact
builds — each enumerated with a reason in
tests/test_plan_lint.py:EAGER_BUILD_OK, and the no-jobs rule is
enforced mechanically there for everything else.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# DataFrames persisted via pin(), awaiting release_pins().
_LIVE_PINS: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Lazily pin a multi-referenced intermediate: ``persist()`` marks
    the subplan cacheable without launching a job, so every reference
    in the final plan reads the once-computed blocks (InMemoryTableScan)
    instead of re-expanding the subplan. MEMORY_AND_DISK (the default)
    spills instead of evicting, so correctness never depends on cache
    pressure. Use for metadata- / vocabulary-sized frames consumed by
    2+ downstream references; iterative loops keep
    ``localCheckpoint(eager=True)`` (they need lineage truncation,
    which persist does not provide)."""
    out = df.persist()
    _LIVE_PINS.append(out)
    return out


def release_pins() -> None:
    """Unpersist every pin() survivor — bench.py calls this between
    queries; one-shot processes (the driver gate, tests) may skip it
    and let session teardown reclaim the blocks.

    SINGLE-BUILDER ASSUMPTION (advisor r12): the pin ledger is
    process-global, so release_pins() drops EVERY live pin — including
    one inside a query another caller built but has not yet executed
    (that query stays correct, it just recomputes the subplan instead
    of hitting the cache). Every current caller builds → executes →
    releases serially (bench, parity, the driver gate, tests), so the
    single-computation guarantee holds; a future concurrent-builder
    caller must scope its own pins instead of calling this."""
    while _LIVE_PINS:
        try:
            _LIVE_PINS.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


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
#   2. Every entry ADDED or semantically CHANGED this round rotates IN
#      immediately.
#   3. Every family keeps at least one in-window representative.
#   4. Slow entries (live streaming drains) sit at the END of the
#      window; un-gated drains stay at the registry tail.
#   5. STALENESS rotation (r11 on, VERDICT r10 task 7): with every
#      entry driver-evidenced at least once, displacement priority
#      inverts — the slots not held by rules 1/2/4 go OLDEST-driver-
#      evidence-first (per CORRECTNESS_r*.json), displacing the
#      members with the longest consecutive green streaks.
# Round-12 window: rule 2 rotates IN dedup_incremental_lsh (now SERVED
# from the persisted corpus band table — the r12 headline change) plus
# basket_part_pairs and events_cohort_retention (their multi-consumer
# intermediates moved from eager checkpoints to lazy pins — same rows,
# new plan shape, worth a fresh driver row); rule 5 rotates IN the six
# stalest entries, all r02-evidence: embedding_neardup_lsh,
# event_type_distinct_users_approx, similarity_ann_lsh,
# similarity_ann_ivf (both now twin-identity-checked in parity),
# text_sentences_udtf, text_token_counts. OUT: nine freshly-r11-
# evidenced members (events_sessionized, events_hourly_tumbling,
# events_sliding_windows, events_json_props, events_json_typed,
# embedding_neardup_pairs, similarity_topk_bruteforce,
# text_fingerprints, text_winnowing_fingerprints) — events keeps
# trend_anomalies/touch_attribution/twap/drift_psi + the returning
# cohort_retention; embedding/similarity/text coverage continues via
# the incoming members. Full displacement log: GATE_HISTORY.md.
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
    # rule 2 — changed r12: the incremental near-dup match now serves
    # from the persisted sig-bucketed corpus band table (no corpus
    # re-shingle); these two moved multi-consumer intermediates from
    # eager checkpoints to lazy pins (same rows, new plan shape)
    "dedup_incremental_lsh",
    "basket_part_pairs",
    "events_cohort_retention",
    # holdovers with r12 semantic extensions (rule 2): doc-similarity
    # df cap (r11), image fixture now mixes progressive/4:2:0 JPEGs,
    # audio metadata decode
    "text_doc_similarity",
    "multimodal_image_features",
    "multimodal_audio_features",
    # serving path of the LSH store (rows-only at the driver;
    # twin-identical to the inline form in tools/parity.py)
    "similarity_ann_lsh_served",
    # rule 5 — stalest (r02 evidence): label-blocked LSH near-dup,
    # approx distinct, the two ANN entries (twin-identity-checked in
    # parity since r12), UDTF sentences, token counts
    "embedding_neardup_lsh",
    "event_type_distinct_users_approx",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "text_sentences_udtf",
    "text_token_counts",
    # text reps (rule 3)
    "text_lang_id",
    "text_quality_scores",
    "text_tfidf",
    # approx/ML family rows-only slot (rotation: hll_rollup r6,
    # gk-quantiles r7, SemDeDup r8; PCA-whitening r9-r10)
    "embedding_pca_whitened",
    # relational reps (rule 3): WOE/IV scoring + lakehouse CDC MERGE
    "orders_priority_woe_iv",
    "orders_cdc_merge",
    # events/timeseries reps (rule 3; events_type_transitions, green
    # through r10, cedes its slot to the new live multimodal drain —
    # events keeps trend_anomalies/touch_attribution/twap/drift_psi)
    "events_trend_anomalies",
    "events_touch_attribution",
    "events_value_twap",
    # dedup reps
    "dedup_jaccard_prefix",
    "dedup_repeated_substrings",
    # curation rows-only slot (the distributed-GD quality classifier,
    # first driver row r10)
    "documents_quality_logreg",
    # events / streaming-batch PSI drift monitor
    "events_drift_psi",
    # curation anchor
    "curation_leakage_split",
    # graph reps
    "trade_graph_communities_lpa",
    "neardup_communities_lpa",
    "trade_graph_pagerank",
    # search / multimodal anchors (search_bm25_multi, green r7-r10,
    # cedes its slot to the new video-features entry — the served
    # variant shares its SQL verbatim and keeps search covered)
    "search_bm25_served",
    "documents_length_histogram",
    "multimodal_video_features",
    # rule 2 — real PIXEL/SAMPLE/FRAME decode landed this round: resize
    # now decodes PNG/GIF/BMP pixels and checksums the resample, video
    # walks real AVI containers, loudness decodes PCM samples
    # (displacing text_novelty_ngrams + text_cms_heavy_hitters, both
    # green through r10; text keeps 6 in-window reps)
    "multimodal_image_resize",
    "multimodal_video_frames",
    "multimodal_audio_loudness",
    # live streaming drains — oracle-backed, last on purpose (rule 2:
    # streaming_multimodal_features is NEW this round — decode-on-
    # ingest sharing the batch image-features oracle)
    "streaming_inverted_index",
    "streaming_cdc_apply",
    "streaming_neardup_lsh",
    "streaming_multimodal_features",
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
