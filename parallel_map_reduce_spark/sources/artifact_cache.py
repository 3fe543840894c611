"""Atomic publish for cached derived artifacts (/tmp parquet stores).

Several query families serve from build-once/serve-many artifacts
(LSH candidate edges, IVF/PQ/IVFPQ indexes, bucketed graph edges).
The original check-then-build pattern had two races the advisor
flagged:

- two concurrent processes can both see the artifact missing and run
  overlapping ``mode("overwrite")`` writes into the SAME directory —
  torn output that both then serve;
- a cache key of ``int(mtime)`` (1 s resolution) lets a source
  regenerated within the same second silently serve a stale artifact
  while the DuckDB oracle computes live — a gate hash mismatch with
  no local repro.

Fix here: build into a UNIQUE temp directory and ``os.rename`` it
into place (atomic on POSIX within one filesystem — /tmp to /tmp).
Losing a publish race is fine: the loser's rename fails because the
destination exists, it discards its build and serves the winner's
(both builds are deterministic functions of the same source). Keys
use nanosecond mtime + file size, so same-second regeneration
invalidates.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

_MARKER = "_BUILT"

# Advisor r8: per-source-version artifacts (bucketed graph edges, LSH
# candidate stores, scaled corpora) otherwise accumulate unboundedly in
# /tmp across regenerations. Each family keeps its most-recently-USED
# keys (the marker file is touched on every cache hit, so recency is
# access time, not publish time); older keys are removed after a fresh
# publish. Trade-off, documented: a concurrent process serving an
# artifact older than the newest KEEP keys could see its files vanish
# mid-read — with KEEP=8 that needs eight newer source versions
# published while the reader is mid-query, which does not happen in
# any supported workflow (one driver process per round).
_FAMILY_KEEP = int(os.environ.get("SPARK_GRAFT_ARTIFACT_KEEP", "8"))


def _prune_family(parent: str) -> None:
    """Remove all but the _FAMILY_KEEP most-recently-used published
    artifacts under ``parent``; in-flight .build-* temp dirs are never
    touched (their builder cleans them)."""
    try:
        entries = os.listdir(parent)
    except OSError:
        return
    published = []
    for e in entries:
        if e.startswith(".build-"):
            continue
        marker = os.path.join(parent, e, _MARKER)
        try:
            published.append((os.stat(marker).st_mtime_ns, os.path.join(parent, e)))
        except OSError:
            continue
    published.sort(reverse=True)
    for _, d in published[_FAMILY_KEEP:]:
        shutil.rmtree(d, ignore_errors=True)


def source_key(tag: str, sf_dir: str, source_file: str | list[str]) -> str:
    """Cache key for an artifact derived from one or more source
    parquet files: nanosecond mtime + size per file, so a regenerated
    source never collides even within the same second."""
    files = [source_file] if isinstance(source_file, str) else list(source_file)
    stamps = []
    for f in files:
        p = os.path.join(sf_dir, f)
        try:
            st = os.stat(p)
            stamps.append(f"{f}={st.st_mtime_ns}:{st.st_size}")
        except OSError:
            stamps.append(f"{f}=absent")
    return hashlib.md5(
        f"{tag}:{os.path.abspath(sf_dir)}:{';'.join(stamps)}".encode()
    ).hexdigest()[:12]


def artifact_path(family: str, key: str) -> str:
    return os.path.join(tempfile.gettempdir(), family, key)


def ensure_artifact(
    family: str, key: str, build: Callable[[str], None]
) -> str:
    """Return the published artifact directory for (family, key),
    building it first if absent. ``build(tmp_dir)`` must write the
    complete artifact into ``tmp_dir``; publication is one atomic
    rename, so readers only ever see absent or complete."""
    final = artifact_path(family, key)
    marker = os.path.join(final, _MARKER)
    if os.path.exists(marker):
        try:
            os.utime(marker)  # recency for the family LRU
        except OSError:
            pass
        return final
    parent = os.path.dirname(final)
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".build-{key}-{os.getpid()}-{uuid.uuid4().hex[:8]}")
    try:
        os.makedirs(tmp, exist_ok=True)
        build(tmp)
        with open(os.path.join(tmp, _MARKER), "w") as f:
            f.write("ok")
        try:
            os.rename(tmp, final)
        except OSError:
            if not os.path.exists(os.path.join(final, _MARKER)):
                # A marker-less destination is a torn leftover (the
                # pre-atomic scheme, or a killed writer): published
                # dirs always carry the marker because it is written
                # into tmp BEFORE the rename. Clear it and retry once;
                # if the retry ALSO hits an existing destination, a
                # concurrent builder published between our rmtree and
                # rename — serve theirs if it carries the marker.
                shutil.rmtree(final, ignore_errors=True)
                try:
                    os.rename(tmp, final)
                except OSError:
                    if not os.path.exists(os.path.join(final, _MARKER)):
                        raise
            # else: lost the publish race — serve the winner's
            # identical artifact, drop ours.
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    _prune_family(parent)
    return final
