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
