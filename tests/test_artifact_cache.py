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
