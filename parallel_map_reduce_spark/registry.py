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
# Round-17 window: rule 2 rotates IN the three NEW entries —
# ingest_warc_charsets (charset-aware payload decode over the nine
# non-UTF-8 fixture sub-cases), text_lang_id_served (language ID from
# the persisted profile artifact, one-shuffle serving plan), and
# crawl_wet_to_index (WET loop landed through the catalog and indexed
# by the flagship) — while the five r17 semantically-changed entries
# hold their slots: ingest_warc_records / ingest_warc_html_text /
# crawl_pipeline_e2e / crawl_wet_roundtrip (the whole chain now
# decodes per-charset and accepts deflate; fixture regenerated to the
# 10-template cycle) and text_lang_trigram_id (trigram domain widened
# to lowercase BMP letters, nine-language fixture);
# streaming_warc_ingest holds its tail slot (offsets reworked to file
# names, cap moved into latestOffset). Rule 5 rotates IN the stalest
# evidence fleet-wide — the r04 cohort SURVEY's note predicted:
# q17_small_quantity_revenue, decontaminate_benchmark_overlap,
# dedup_passage_duplicates, customer_pii_masked,
# neardup_triangle_census, similarity_two_stage_topk,
# part_name_fuzzy_pairs_lsh (none driver-gated since r4-r6).
# OUT, longest-green-first with every family keeping a rep:
# similarity_ann_ivf (6; ANN/similarity now repped by the incoming
# oracle-backed similarity_two_stage_topk + the ivfpq drain),
# asof_purchase_last_click (6; joins repped by the relational block),
# multimodal_image_resize_oriented (3; multimodal repped by
# audio_loudness + video_frames), dedup_corpus_promote_compacted (3;
# dedup repped by url_canonical + the incoming passage/decontaminate/
# neardup block), embedding_l2_norms_arrow (3; Arrow surfaces repped
# by text_sentences_udtf), nation_customer_supplier_outer (3),
# dedup_clusters (2), text_unicode_bpe (2; unicode repped by nfc +
# line_repetition + the lang entries), text_html_extract (2; the
# extraction contract is exercised INSIDE four gated WARC entries),
# streaming_band_index (3; streaming stays repped by the flagship
# RocksDB drain + ivfpq + url-frontier + warc drains) — ten OUT, ten
# IN, window stays 50. Kept despite streaks:
# streaming_inverted_index (10, flagship drain + RocksDB engagement
# witness), trade_graph_pagerank (9, only graph),
# multimodal_video_frames (7, only video), text_sentences_udtf (6,
# only UDTF), multimodal_audio_loudness (6, only audio),
# event_type_distinct_users_approx (6, only sketch),
# orders_status_priority_cube (3, only grouping-sets),
# search_positional_index (3, only search),
# curation_train_val_split (3, only curation).
#
# Round-16 window: rule 2 rotates IN the six never-driver-evidenced
# new/changed entries: ingest_warc_records + ingest_warc_html_text
# (NEW — WARC container ingestion, the crawl chain's front end),
# crawl_pipeline_e2e (NEW — the whole crawl chain as ONE zero-shuffle
# plan, canonical URL proven against composition),
# streaming_warc_ingest (NEW — the live landing-zone drain),
# text_lang_trigram_id (NEW — char-trigram language ID), and
# streaming_url_frontier (URL contract gained §5.2.4 dot-segment
# removal this round; never driver-gated). text_html_extract,
# text_unicode_nfc (widened to the full table + Hangul) and
# dedup_url_canonical (dot segments) hold their slots under the same
# rule. Rule 5 rotates IN the stalest entries fleet-wide — ALL
# remaining r03 driver evidence (q18_large_orders, q11_top_spenders,
# q7_nation_trade_matrix, q22_idle_rich_customers,
# orders_trailing_7d_spend, q14_promo_revenue_ratio,
# q19_brand_size_disjunction, segment_event_value_salted,
# q16_part_supplier_variety — the r04 cohort becomes the stalest for
# r17). OUT, longest-green-first with every family keeping a rep:
# streaming_neardup_lsh + streaming_cdc_apply (9 each; streaming
# stays repped by the flagship RocksDB drain + ivfpq + band + the two
# incoming drains), nation_set_ops (6; set ops repped by
# customer_priority_multiset), streaming_multimodal_features (5;
# multimodal repped by resize_oriented/audio/video),
# quantity_size_range_join + orders_status_pivot (5 each; joins
# repped by outer + as-of, relational rich), active_customer_spend
# (4), late_shipment_priority + event_value_quantiles +
# event_type_distinct_users + customer_running_spend (3 each) +
# orders_price_percent_rank (2; aggs/windows repped by histogram/
# cube/the incoming trailing-7d frame query, sketch twin
# event_type_distinct_users_approx stays), text_unicode_tokens +
# text_unicode_script_id + dedup_unicode_jaccard (2 each; unicode
# repped by bpe/nfc/line_repetition, dedup by clusters/promote/
# url_canonical) — fifteen OUT, fifteen IN, window stays 50.
# Kept despite streaks: streaming_inverted_index (9, flagship drain +
# RocksDB engagement witness), trade_graph_pagerank (8, only graph),
# multimodal_video_frames (6, only video), text_sentences_udtf (5,
# only UDTF), similarity_ann_ivf (5, only ANN), multimodal_audio_
# loudness (5, only audio), event_type_distinct_users_approx (5,
# only sketch), asof_purchase_last_click (5, the distinctive join).
#
# Round-15 window: rule 2 rotates IN text_html_extract (NEW — HTML
# extraction contract over the committed fixture) and
# text_unicode_nfc (NEW — NFC composition vs utf8proc/unicodedata);
# text_unicode_bpe holds its slot (gained a DuckDB oracle this
# round — the unrolled merge-loop replay), streaming_inverted_index
# holds its tail slot (drain moved onto the RocksDB state store),
# and dedup_corpus_promote_compacted holds (r15 try/finally DROP
# discipline in _compact_build_dir, which it exercises directly).
# Rule 5 rotates IN the stalest entries, all r03 driver evidence
# (oldest-first per policy; the r14 verdict's q17/scd2 examples are
# r05/r06 — these outrank them): customer_order_histogram,
# customer_priority_multiset, dedup_clusters,
# event_type_distinct_users, event_value_quantiles,
# late_shipment_priority, orders_price_percent_rank.
# OUT, longest-green-first with every family keeping a rep:
# multimodal_image_metadata (2; image stays repped by
# resize_oriented), embedding_semantic_dedup (2; twin stays recorded
# in parity), dedup_exact / dedup_simhash / dedup_minhash_signatures
# (2 each; dedup repped by ngram_jaccard + unicode_jaccard +
# incoming dedup_clusters), dedup_corpus_promote (2; compacted twin
# stays), customers_without_events (2; joins repped by outer/range/
# as-of), q5_region_revenue + q2_cheapest_part_per_type (2 each;
# TPC-H repped by the incoming r03 block + percent_rank window rep)
# — nine OUT, nine IN, window stays 50. Kept despite streaks:
# trade_graph_pagerank (5, only graph rep — rule 3),
# multimodal_audio_loudness / multimodal_video_frames (4, only
# audio/video reps), event_type_distinct_users_approx (3, only
# sketch rep), similarity_ann_ivf (3, only ANN rep),
# text_sentences_udtf (3, only UDTF rep).
#
# Round-14 window: rule 2 rotated IN text_unicode_tokens (NEW — the
# UTF-8 tokenization contract, oracle-backed on the committed
# multi-script fixture), multimodal_image_resize_oriented (the image
# fixture now cycles ALL EIGHT EXIF orientations — the transpose path
# is exercised for the first time; never driver-gated before) and
# dedup_corpus_promote_compacted (never driver-gated; compaction is
# now also the automatic chain policy in ensure_bucketed_append);
# dedup_corpus_promote (append path gained the auto-compaction
# policy + errno-aware fallback) and multimodal_image_metadata
# (regenerated fixture payloads) hold their slots under the same
# rule, as does the refactored streaming_band_index drain. Rule 5
# rotates IN the stalest oracle-backed entries (r03/r04 evidence):
# search_positional_index, curation_train_val_split,
# embedding_l2_norms_arrow, active_customer_spend,
# customer_running_spend, dedup_ngram_jaccard,
# nation_customer_supplier_outer, orders_status_priority_cube,
# quantity_size_range_join (customer_order_histogram,
# event_type_distinct_users and late_shipment_priority were initially
# picked too but ceded their slots to the late rule-2 unicode
# entries — rule 2 outranks rule 5; they stay stale for r15).
# OUT, longest-green-first (every family keeps a rep):
# curation_leakage_split (7 -> covered by curation_train_val_split),
# search_bm25_served (5 -> search_positional_index),
# documents_quality_logreg (4; twin stays recorded in parity),
# multimodal_image_features / multimodal_audio_features /
# multimodal_video_features (3 each; loudness/frames/metadata/
# oriented-resize keep the decoders covered),
# similarity_ann_lsh_served / similarity_ann_lsh /
# embedding_neardup_lsh (ANN stays repped by similarity_ann_ivf +
# twin records), text_lang_id / text_quality_scores / text_tfidf /
# text_token_counts (text repped by sentences_udtf + the unicode
# entries), dedup_incremental_lsh, basket_part_pairs,
# events_cohort_retention — sixteen OUT in total.
# Full displacement log: GATE_HISTORY.md.
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
    # rule 2 — NEW r17: charset decode, served lang-ID, WET->index,
    # robots exclusion (RFC 9309, composed-verdict fixture)
    "ingest_warc_charsets",
    "text_lang_id_served",
    "crawl_wet_to_index",
    "crawl_robots_filter",
    "crawl_sitemap_urls",
    "crawl_sitemap_frontier",
    # rule 2 — r17 semantically changed: the crawl chain decodes per
    # charset (+deflate, 10-template fixture); lang domain widened
    "ingest_warc_records",
    "ingest_warc_html_text",
    "crawl_pipeline_e2e",
    "crawl_wet_roundtrip",
    "text_lang_trigram_id",
    # rule 2 holdovers (r16 changes, second green)
    "text_unicode_nfc",
    "text_line_repetition",
    "dedup_url_canonical",
    # rule 5 — NEW r17: the stalest evidence fleet-wide (the r04
    # cohort; none driver-gated since r4-r6)
    "q17_small_quantity_revenue",
    "decontaminate_benchmark_overlap",
    "dedup_passage_duplicates",
    "customer_pii_masked",
    "neardup_triangle_census",
    "similarity_two_stage_topk",
    "part_name_fuzzy_pairs_lsh",
    # rule 5 — r16's stale block (fresh r16 evidence, kept as the
    # relational/window/agg family reps; q18_large_orders and
    # q11_top_spenders rotated out mid-r17 for crawl_robots_filter +
    # crawl_sitemap_urls — the relational family keeps seven
    # in-window reps)
    "q7_nation_trade_matrix",
    "q22_idle_rich_customers",
    "orders_trailing_7d_spend",
    "q14_promo_revenue_ratio",
    "q19_brand_size_disjunction",
    "segment_event_value_salted",
    "q16_part_supplier_variety",
    # holdovers (family reps; streaks noted in the window comment)
    "customer_priority_multiset",
    "search_positional_index",
    "curation_train_val_split",
    "orders_status_priority_cube",
    # multimodal_audio_loudness rotated out mid-r17 for
    # crawl_sitemap_frontier; multimodal stays repped by
    # multimodal_video_frames
    "event_type_distinct_users_approx",
    "text_sentences_udtf",
    # graph rep (rule 3)
    "trade_graph_pagerank",
    # multimodal video rep
    "multimodal_video_frames",
    # live streaming drains — oracle/twin-backed, last on purpose
    "streaming_inverted_index",
    "streaming_ivfpq_index",
    "streaming_url_frontier",
    "streaming_warc_ingest",
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
