"""Change-data-capture MERGE: apply an upsert/delete feed to a snapshot.

The reference engine has no mutation surface — its single query is a
full rebuild of the inverted index from scratch (`src/tema1.cpp:344-380`
re-reads every file each run). Any engine serving the same workloads at
100 TB needs the opposite primitive: apply a (usually tiny) change feed
to a (usually huge) snapshot without rewriting unaffected data — the
Delta Lake / Apache Iceberg ``MERGE INTO`` pattern.

Formulation chosen here (the scalable one):

    union(snapshot tagged seq=-1, feed) -> hash-aggregate per key taking
    the row with the HIGHEST sequence number -> drop rows whose winning
    op is a delete.

This is ONE exchange on the merge key, with map-side partial
aggregation, instead of the naive two-shuffle plan (window-compact the
feed, then full-outer-join it against the snapshot). ``max_by`` over a
packed struct keeps the whole row attached to the winning sequence
number, so there is no second pass to re-fetch payloads.

Contract: ``(key, seq)`` pairs must be unique across the union —
``max_by`` ties are nondeterministic. The snapshot is tagged seq=-1 so
any feed row (seq >= 0) beats it.

At 100 TB: the snapshot side dominates; because the aggregation key is
the merge key, a snapshot ALREADY bucketed/partitioned by that key
(see operators/layout.py bucketing) avoids even this exchange for its
rows — only the feed shuffles. Deletes must be retained as tombstones
when the feed can arrive out of order across batches; here one batch is
merged, so tombstoned keys simply drop out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE_OP = "D"


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins MERGE of ``changes`` into ``snapshot``.

    ``changes`` carries the snapshot's payload columns plus ``seq_col``
    (monotone per key; later wins) and ``op_col`` (any marker; rows
    whose winning op == ``DELETE_OP`` are removed). Output = payload
    columns keyed by ``key_cols`` plus ``op_col`` showing each row's
    provenance (snapshot tag for untouched rows).
    """
    payload = [c for c in snapshot.columns if c not in key_cols]
    snap = snapshot.select(
        *key_cols,
        F.lit(-1).cast("bigint").alias(seq_col),
        F.lit("K").alias(op_col),
        *payload,
    )
    feed = changes.select(
        *key_cols, F.col(seq_col).cast("bigint").alias(seq_col), op_col, *payload
    )
    packed = F.struct(F.col(op_col), *[F.col(c) for c in payload])
    winner = (
        snap.unionByName(feed)
        .groupBy(*key_cols)
        .agg(F.max_by(packed, F.col(seq_col)).alias("_w"))
    )
    return winner.filter(F.col("_w")[op_col] != DELETE_OP).select(
        *key_cols,
        *[F.col("_w")[c].alias(c) for c in payload],
        F.col("_w")[op_col].alias(op_col),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Derive the change feed between two snapshot versions — MERGE's
    algebraic inverse (reconciliation, backfill auditing, generating a
    feed for downstream consumers from full-table drops).

    Output: one row per differing key with ``op_col`` in {'I','U','D'}
    and the NEW payload ('D' rows carry the old payload, for tombstone
    consumers that need the last-known values). Unchanged keys emit
    nothing, so the result is |changes|-sized. Round-trip law (pinned
    in tests): merge_changes(old, snapshot_diff(old, new)) == new.

    Plan: ONE full-outer sort-merge join on the key. Null-safe payload
    comparison via struct equality (<=> on a packed struct), so NULL
    payload fields compare correctly. At 100 TB: both snapshots
    bucketed by key (operators/layout.py) make this exchange-free; the
    struct compare is a scan-speed projection.
    """
    # A snapshot column named like op_col would duplicate in the output
    # (classification + payload both named 'op') — same defect class as
    # the presence-marker collision below; fail loudly instead.
    if op_col in old.columns:
        raise ValueError(
            f"op_col {op_col!r} collides with a snapshot column; pass a "
            "different op_col"
        )
    payload = [c for c in old.columns if c not in key_cols]
    # Prefix-rename each side (fresh attribute ids) — the two snapshots
    # usually share lineage (new = merge(old, feed)), and dataset
    # aliases cannot disambiguate a self-join through that lineage.
    # Marker names start with a DOUBLE underscore so no prefixed payload
    # column can collide: every renamed payload column starts '_o_'/
    # '_n_' (single underscore), so '_o_' + c can never equal
    # '__o_present__' for any c (advisor r7: a payload column literally
    # named 'present' also renamed to '_o_present' and broke the
    # classification).
    o = old.select(
        [F.col(c).alias(f"_o_{c}") for c in old.columns]
        + [F.lit(True).alias("__o_present__")]
    )
    n = new.select(
        [F.col(c).alias(f"_n_{c}") for c in old.columns]
        + [F.lit(True).alias("__n_present__")]
    )
    cond = [
        F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}")) for k in key_cols
    ]
    joined = o.join(n, cond, "full_outer")
    o_pack = F.struct(*[F.col(f"_o_{c}").alias(c) for c in payload])
    n_pack = F.struct(*[F.col(f"_n_{c}").alias(c) for c in payload])
    # Presence = explicit per-side marker, NOT key-column isNotNull:
    # the join is eqNullSafe, so a key whose columns are all NULL can
    # legitimately exist on both sides and must classify as 'U'/
    # unchanged, never 'I'.
    o_present = F.col("__o_present__").isNotNull()
    n_present = F.col("__n_present__").isNotNull()
    op = (
        F.when(~o_present, F.lit("I"))
        .when(~n_present, F.lit("D"))
        .when(~o_pack.eqNullSafe(n_pack), F.lit("U"))
    )
    src = F.when(F.col(op_col) == "D", o_pack).otherwise(n_pack)
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k)
                for k in key_cols
            ],
            F.col(op_col),
            *[src[c].alias(c) for c in payload],
        )
    )
