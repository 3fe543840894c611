"""Salted two-phase aggregation: exact equality with direct aggregation,
including on a deliberately skewed key distribution."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parallel_map_reduce_spark.functions.skew import (
    salted_count_distinct,
    salted_sum_count,
)
from parallel_map_reduce_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    """1 hot key with ~90% of rows + a long tail — the shape salting exists for."""
    base = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("key"),
        (F.col("id") % 1_000).alias("val"),
    )
    return base.cache()


def test_salted_sum_count_exact(spark, skewed):
    direct = {
        (r.key, r.total, r.n_rows)
        for r in skewed.groupBy("key")
        .agg(F.sum("val").alias("total"), F.count("*").alias("n_rows"))
        .collect()
    }
    salted = {(r.key, r.total, r.n_rows) for r in salted_sum_count(skewed, "key", "val").collect()}
    assert salted == direct and len(direct) > 1


def test_salted_count_distinct_exact(spark, skewed):
    direct = {
        (r.key, r.n)
        for r in skewed.groupBy("key").agg(F.countDistinct("val").alias("n")).collect()
    }
    salted = {
        (r.key, r.n_distinct) for r in salted_count_distinct(skewed, "key", "val").collect()
    }
    assert salted == direct


def test_salted_on_real_table(spark, sf_dir):
    """Same contract on the events table (user_id per event_type)."""
    e = load_table(spark, sf_dir, "events")
    direct = {
        (r.event_type, r.n)
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    salted = {
        (r.event_type, r.n_distinct)
        for r in salted_count_distinct(e, "event_type", "user_id").collect()
    }
    assert salted == direct and len(direct) > 0


def test_salted_replicate_join_equals_plain_join(spark, sf_dir):
    """salt-and-replicate must be invisible in the result: exactly the
    rows of the plain equi-join, under any salt width."""
    import pyspark.sql.functions as F

    from parallel_map_reduce_spark.functions.skew import (
        salted_broadcast_replicate_join,
    )
    from parallel_map_reduce_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_type", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = ev.join(cust, "c_custkey")
    for n in (1, 4, 16):
        salted = salted_broadcast_replicate_join(ev, cust, "c_custkey", n)
        assert sorted(salted.columns) == sorted(plain.columns)
        assert salted.count() == plain.count()
        assert salted.exceptAll(plain).isEmpty()
        assert plain.exceptAll(salted).isEmpty()
