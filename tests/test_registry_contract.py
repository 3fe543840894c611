"""Registry-level driver-contract lint.

The driver imports ``__spark_entry__`` and runs every entry against its
oracle on PRE-REGISTERED DuckDB views of the catalog tables. These
checks guard the conventions that keep that gate green — a new entry
violating them would fail in the driver, not locally, where it is
cheapest to catch.
"""

from __future__ import annotations

import re

from parallel_map_reduce_spark.registry import all_queries
from parallel_map_reduce_spark.sources.catalog import TABLES


def test_every_entry_documented_and_tagged():
    for name, spec in all_queries().items():
        assert spec.doc and len(spec.doc) > 40, f"{name}: missing/thin doc"
        assert spec.tags, f"{name}: no tags"
        assert re.fullmatch(r"[a-z0-9_]+", name), f"{name}: bad name"


# Oracles for the reference's OWN text corpus must read those raw files
# directly — there is no catalog view of them, and the driver's gate
# hash-matched these entries in round 2, proving its DuckDB resolves the
# paths. Everything else must go through the pre-registered views.
RAW_PATH_ORACLES = {
    "manifest_inverted_index",
    "reference_corpus_index",
}


def test_oracles_use_only_catalog_views():
    """Oracle SQL must reference the pre-registered views — no absolute
    paths (the driver's DuckDB sees views, not our filesystem layout) —
    except the reference-corpus family, which reads the reference's own
    files by design."""
    for name, spec in all_queries().items():
        if spec.oracle is None or name in RAW_PATH_ORACLES:
            continue
        sql = spec.oracle.lower()
        assert "read_parquet" not in sql, f"{name}: oracle bypasses views"
        assert "/root/" not in sql, f"{name}: absolute path in oracle"
        assert any(t in sql for t in TABLES), f"{name}: no catalog table referenced"


def test_rows_only_entries_are_the_documented_set():
    """Every no-oracle entry must be on the explicit list of
    approximate/ANN operators that carry pytest contracts instead —
    adding a rows-only entry silently weakens the gate."""
    expected = {
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        "embedding_neardup_lsh",
        "event_type_distinct_users_approx",
        "event_value_quantiles_approx",
        "streaming_sliding_users_approx",
        "event_users_hll_rollup",
        "events_rolling_7d_users_hll",
    }
    actual = {n for n, s in all_queries().items() if s.oracle is None}
    assert actual == expected, actual.symmetric_difference(expected)


def test_live_streaming_entries_registered_last():
    """Slowest entries (live drains) must stay at the registry tail so a
    wall-clock-budgeted gate run never truncates fast entries behind
    them (the round-2 failure mode)."""
    names = list(all_queries())
    live = [n for n in names if n.startswith("streaming_")]
    assert names[-len(live):] == live, "live entries not contiguous at tail"
