"""Atomic-publish contract for cached derived artifacts
(sources/artifact_cache.py — advisor r7: concurrent check-then-build
writers could interleave into one directory, and 1-second mtime keys
served stale artifacts after same-second source regeneration)."""

from __future__ import annotations

import os

import pytest

from parallel_map_reduce_spark.sources.artifact_cache import (
    artifact_path,
    ensure_artifact,
    source_key,
)

FAM = "pmrs_test_cache"


@pytest.fixture(autouse=True)
def _clean():
    import shutil

    shutil.rmtree(os.path.join("/tmp", FAM), ignore_errors=True)
    yield
    shutil.rmtree(os.path.join("/tmp", FAM), ignore_errors=True)


def _build(tmp):
    with open(os.path.join(tmp, "data.txt"), "w") as f:
        f.write("v1")


def test_build_once_then_serve_cached():
    p = ensure_artifact(FAM, "k1", _build)
    assert open(p + "/data.txt").read() == "v1"

    def explode(tmp):
        raise AssertionError("must not rebuild a published artifact")

    assert ensure_artifact(FAM, "k1", explode) == p


def test_torn_markerless_destination_is_cleared_and_rebuilt():
    """Published dirs ALWAYS carry the marker (written into the temp
    dir before the atomic rename), so a marker-less destination is a
    torn leftover and must be replaced, not served."""
    torn = artifact_path(FAM, "k2")
    os.makedirs(torn)
    with open(torn + "/garbage", "w") as f:
        f.write("x")
    p = ensure_artifact(FAM, "k2", _build)
    assert open(p + "/data.txt").read() == "v1"
    assert not os.path.exists(p + "/garbage")


def test_failed_build_publishes_nothing():
    def boom(tmp):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        ensure_artifact(FAM, "k3", boom)
    assert not os.path.exists(artifact_path(FAM, "k3"))
    leftovers = [
        d for d in os.listdir(os.path.join("/tmp", FAM)) if d.startswith(".build-")
    ]
    assert not leftovers


def test_source_key_changes_within_one_second(tmp_path):
    """ns-mtime + size keying: rewriting the source file invalidates
    the key even when both writes land in the same integer second."""
    src = tmp_path / "documents.parquet"
    src.write_text("a")
    k1 = source_key("t", str(tmp_path), "documents.parquet")
    src.write_text("bb")  # same second; different mtime_ns and size
    k2 = source_key("t", str(tmp_path), "documents.parquet")
    assert k1 != k2


def test_family_lru_prunes_beyond_keep():
    """Advisor r8: per-source-version artifacts must not accumulate
    unboundedly. After publishing KEEP+3 keys, only the KEEP
    most-recently-used survive — and a cache HIT refreshes recency, so
    a hot old key outlives colder newer ones."""
    import time

    from parallel_map_reduce_spark.sources import artifact_cache as ac

    keep = ac._FAMILY_KEEP
    keys = [f"lru{i:02d}" for i in range(keep + 3)]
    for k in keys:
        ensure_artifact(FAM, k, _build)
        time.sleep(0.01)  # distinct marker mtimes
    fam_dir = os.path.dirname(artifact_path(FAM, keys[0]))
    alive = {e for e in os.listdir(fam_dir)}
    assert len(alive) == keep
    # the newest KEEP keys survive, the oldest 3 are gone
    assert set(keys[-keep:]) == alive
    # a HIT on the oldest survivor refreshes its recency past a new
    # publish wave
    hot = keys[-keep]
    ensure_artifact(FAM, hot, _build)  # hit: touches marker
    time.sleep(0.01)
    for i in range(keep - 1):
        ensure_artifact(FAM, f"wave{i:02d}", _build)
        time.sleep(0.01)
    assert os.path.exists(artifact_path(FAM, hot))


def test_bucketed_table_registration_drops_superseded_keys(spark, tmp_path):
    """Advisor r8 (layout): each regenerated source registers a fresh
    `{table}_{key}` — superseded same-prefix registrations must leave
    the catalog on the next registration instead of accumulating."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_spark.operators.layout import ensure_bucketed_table

    df = spark.range(100).select(
        F.col("id").cast("string").alias("src"), F.col("id").alias("v")
    )
    t1 = ensure_bucketed_table(
        spark, "pmrs_test_evict", "pmrs_test_cache", "kold", lambda: df, "src", 4
    )
    assert spark.catalog.tableExists(t1)
    t2 = ensure_bucketed_table(
        spark, "pmrs_test_evict", "pmrs_test_cache", "knew", lambda: df, "src", 4
    )
    try:
        assert spark.catalog.tableExists(t2)
        assert not spark.catalog.tableExists(t1), "superseded key not dropped"
        # re-registration of the evicted key works from its cached artifact
        t1b = ensure_bucketed_table(
            spark, "pmrs_test_evict", "pmrs_test_cache", "kold", lambda: df, "src", 4
        )
        assert spark.catalog.tableExists(t1b)
        assert spark.table(t1b).count() == 100
    finally:
        for t in (t1, t2):
            spark.sql(f"DROP TABLE IF EXISTS `{t}`")


def test_supersede_eviction_never_crosses_bases(spark):
    """Advisor r9 (layout): eviction used a bare name-prefix match, so
    a base that textually EXTENDS another (`..._sf0_1` vs
    `..._sf0_1_bak`) could have its live registration dropped by the
    shorter base's supersede sweep. Eviction must match exactly
    base + one underscore-free key segment."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_spark.operators.layout import ensure_bucketed_table

    df = spark.range(10).select(
        F.col("id").cast("string").alias("src"), F.col("id").alias("v")
    )
    t_ext = ensure_bucketed_table(
        spark, "pmrs_test_ev2_bak", "pmrs_test_cache", "kext", lambda: df, "src", 4
    )
    t_short = ensure_bucketed_table(
        spark, "pmrs_test_ev2", "pmrs_test_cache", "kshort", lambda: df, "src", 4
    )
    try:
        assert spark.catalog.tableExists(t_short)
        assert spark.catalog.tableExists(t_ext), (
            "extending base's registration dropped by the shorter base's sweep"
        )
    finally:
        for t in (t_ext, t_short):
            spark.sql(f"DROP TABLE IF EXISTS `{t}`")


def test_bucketed_serving_hit_refreshes_family_lru(spark):
    """Advisor r9 (layout): the tableExists early-return skipped
    ensure_artifact, so serving hits never refreshed the _BUILT
    marker's mtime and the family LRU could prune the files backing a
    still-registered table. A hit must bump marker recency."""
    import os
    import time

    from pyspark.sql import functions as F

    from parallel_map_reduce_spark.operators.layout import ensure_bucketed_table
    from parallel_map_reduce_spark.sources.artifact_cache import artifact_path

    df = spark.range(10).select(
        F.col("id").cast("string").alias("src"), F.col("id").alias("v")
    )
    name = ensure_bucketed_table(
        spark, "pmrs_test_lru_hit", "pmrs_test_cache", "klru", lambda: df, "src", 4
    )
    marker = os.path.join(artifact_path("pmrs_test_cache", "klru"), "_BUILT")
    try:
        before = os.stat(marker).st_mtime_ns
        time.sleep(0.01)
        ensure_bucketed_table(
            spark,
            "pmrs_test_lru_hit",
            "pmrs_test_cache",
            "klru",
            lambda: (_ for _ in ()).throw(AssertionError("must not rebuild")),
            "src",
            4,
        )
        assert os.stat(marker).st_mtime_ns > before, "hit did not touch marker"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
