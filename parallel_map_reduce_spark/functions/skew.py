"""Skew mitigation: deterministic two-phase (salted) aggregation.

AQE's skew-join splitting handles join-side skew automatically
(session.py enables it); aggregation-side skew on a hot group key still
funnels one key's rows through one reducer. Salting splits each group
into SALT_N sub-groups for the first (heavy) aggregation, then combines
the partial results in a second, tiny aggregation keyed on the original
key — the classic two-phase combine.

The salt must be DETERMINISTIC (content-derived, not rand()) so retries
and stage re-executions agg the same rows into the same sub-group —
nondeterministic salts break Spark's task-retry semantics for exactly
this kind of pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_N = 16


def with_salt(
    df: DataFrame, cols: Sequence[str] | None = None, n: int = SALT_N
) -> DataFrame:
    """Add a deterministic salt column in [0, n) derived from xxhash64 of
    the given columns (row-content-derived → stable under retries).

    ``cols=None`` hashes ALL columns — the right default when the salt
    only needs to spread rows (sum/count): salting by a single value
    column degenerates back to one straggler sub-group when a hot key's
    values are constant. Fully-duplicate rows still collide by
    construction; any deterministic salt does (dedupe first, or accept
    it — n identical rows carry no per-row information to hash).
    Pass explicit cols only when correctness requires co-locating equal
    values (see salted_count_distinct)."""
    cs = list(cols) if cols is not None else list(df.columns)
    return df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cs]), F.lit(n)))


def salted_sum_count(
    df: DataFrame,
    group_key: str | Sequence[str],
    sum_col: str,
    n: int = SALT_N,
) -> DataFrame:
    """(group_key..., total, n_rows) via two-phase salted aggregation.

    Phase 1 groups on (key, salt): a key with f rows produces ≤ n partial
    rows regardless of f, so the phase-2 shuffle carries at most n rows
    per key — a hot key can no longer straggle one reducer. sum/count are
    associative, so the result is exactly the direct aggregation
    (tests/test_skew.py pins equality).
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    # Salt over ALL columns: sum/count don't care which sub-group a row
    # lands in, and hashing just sum_col would collapse to one sub-group
    # whenever a hot key's values are constant.
    salted = with_salt(df, None, n)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.sum(sum_col).alias("_psum"), F.count("*").alias("_pcnt")
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_psum").alias("total"), F.sum("_pcnt").alias("n_rows")
    )


def salted_count_distinct(
    df: DataFrame,
    group_key: str | Sequence[str],
    distinct_col: str,
    n: int = SALT_N,
) -> DataFrame:
    """(group_key..., n_distinct) exactly, skew-safe.

    Salting by hash(distinct_col) keeps every copy of one distinct value
    in the same sub-group, so per-sub-group distinct counts add up
    exactly — no overlap between salts. Phase 1 dedups (key, salt,
    value) with map-side combine; phase 2 sums ≤ n rows per key.

    Here the salt MUST stay value-derived (unlike salted_sum_count):
    spreading equal values across salts would double-count them. The
    degenerate case — a hot key with ONE distinct value — is harmless:
    map-side combine collapses it to one row per map task before the
    shuffle, so no straggler forms.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    salted = with_salt(df, [distinct_col], n)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.countDistinct(distinct_col).alias("_pdist")
    )
    return phase1.groupBy(*keys).agg(F.sum("_pdist").alias("n_distinct"))


def salted_broadcast_replicate_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n: int = SALT_N,
) -> DataFrame:
    """fact ⋈ dim on ``key``, skew-proofed by salt-and-replicate: fact
    rows get a deterministic salt in [0, n); the dim side is replicated
    n times (one copy per salt) so the join key becomes (key, salt) and
    a hot fact key spreads over n reducers instead of straggling one.

    This is the SHUFFLE-join fallback for when the dim is too big to
    broadcast but a fact key is hot — with a broadcastable dim, plain
    broadcast join already avoids the problem (no shuffle at all), and
    AQE's skew-join splitting covers moderate skew; salt-and-replicate
    is the deterministic, planner-independent form that also works
    pre-AQE or under disabled AQE. Result is EXACTLY the plain join —
    the salt is an internal partitioning detail (equality pinned in
    tests/test_skew.py; the driver oracle compares against the plain
    SQL join).

    Cost model at 100 TB: dim shuffle volume multiplies by n — size n
    to the actual hot-key factor, not higher."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )
    out = salted_fact.join(replicated_dim, on=[key, "_salt"]).drop("_salt")
    return out
