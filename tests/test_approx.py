"""approx_count_distinct: within HLL++ error bounds of the exact count."""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_map_reduce_spark.sources.catalog import load_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r.event_type: r.a
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.05).alias("a"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.15 * n), (k, n, approx[k])
