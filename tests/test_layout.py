"""Z-order layout: the clustering must actually buy multi-dim pruning.

A file layout is only worth a rewrite if it shrinks per-file min/max
spans on the dimensions queries filter by. This measures exactly that:
partition the events table 16 ways under (a) time-sorted layout and
(b) Z-order layout, and compare the average per-partition span of
user_id. Time-sort gives every partition the FULL user range (span ratio
~1); the Z-curve must cut it by at least half while keeping time spans
bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_map_reduce_spark.operators.layout import events_zvalues, zorder_layout
from parallel_map_reduce_spark.sources.catalog import load_table

N_PARTS = 16


def _avg_span(df, col):
    spans = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
    )
    row = spans.agg(F.avg("span").alias("a")).first()
    return float(row["a"])


def test_zorder_shrinks_user_span(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")

    time_layout = e.repartitionByRange(N_PARTS, "ts").sortWithinPartitions("ts")
    z_layout = zorder_layout(e, n_files=N_PARTS)

    user_span_time = _avg_span(time_layout, "user_id")
    user_span_z = _avg_span(z_layout, "user_id")
    # Z-order must at least halve the per-partition user_id span the
    # time-sorted layout leaves at ~full range.
    assert user_span_z < 0.5 * user_span_time, (user_span_z, user_span_time)


def test_zvalue_bit_roundtrip(spark, sf_dir):
    """Morton interleave must be invertible: de-interleaving the even/odd
    bits recovers the inputs exactly (proves disjoint bit placement)."""
    z = events_zvalues(load_table(spark, sf_dir, "events"))
    even = sum(
        (F.shiftright("zvalue", 2 * i).bitwiseAND(F.lit(1)) * (1 << i) for i in range(16)),
        start=F.lit(0),
    )
    odd = sum(
        (F.shiftright("zvalue", 2 * i + 1).bitwiseAND(F.lit(1)) * (1 << i) for i in range(16)),
        start=F.lit(0),
    )
    bad = z.filter(
        (even.cast("bigint") != F.col("user_bits"))
        | (odd.cast("bigint") != F.col("minute_bits"))
    ).count()
    assert bad == 0


def test_compact_parquet_reduces_files_preserves_content(spark, sf_dir, tmp_path):
    from parallel_map_reduce_spark.operators.layout import compact_parquet
    from parallel_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    shattered = str(tmp_path / "shattered")
    docs.repartition(32).write.parquet(shattered)
    n_in = len([f for f in __import__("os").listdir(shattered) if f.endswith(".parquet")])
    assert n_in >= 30  # genuinely shattered

    compacted = str(tmp_path / "compacted")
    compact_parquet(spark, shattered, compacted, target_file_bytes=1 << 20)
    import os

    n_out = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    assert n_out < n_in / 4, (n_in, n_out)

    back = spark.read.parquet(compacted)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).isEmpty() and docs.exceptAll(back).isEmpty()
