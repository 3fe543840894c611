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


def test_lsh_hot_bucket_band_join_aqe_skew_split(spark):
    """VERDICT r12 task 4: the LSH band join's skew story
    (operators/dedup.py:minhash_lsh_candidates — 'AQE splits any hot
    bucket at scale') witnessed against a planted pathological bucket:
    1,000 byte-identical documents share EVERY band signature, so one
    (band, sig) bucket holds the whole corpus on both join sides. The
    join must (a) complete with the exact closed-form pair count and
    (b) actually engage AQE's skew-join split (skew=true in the final
    sort-merge join). Thresholds are lowered to make the fixture's
    ~100 KB hot partition 'skewed' by the same RELATIVE criterion
    (size > factor x median AND > absolute floor) production uses at
    GB scale; broadcast is disabled so the equi-join plans as SMJ —
    at real scale both sides are corpus-sized and SMJ is what the
    planner picks unaided."""
    from parallel_map_reduce_spark.operators import dedup as D

    saved = {}
    lowered = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512",
        # enough shuffle partitions that the tail's many tiny buckets,
        # not the hot cluster's 4 band keys, set the median size the
        # skew detector compares against
        "spark.sql.shuffle.partitions": "32",
        # at fixture scale EVERY tail partition is far below the
        # advisory size, so partition coalescing would merge the tail
        # first and mask the outlier before the skew check; at
        # production scale tail partitions sit near the advisory size
        # and coalescing is a no-op around a GB-scale hot bucket
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    for k, v in lowered.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        # One pathological bucket (n_hot byte-identical docs) on top of
        # a distinct tail (per-doc unique tokens -> unique band sigs):
        # skew detection is RELATIVE to the median shuffle partition,
        # so the tail is what makes the hot bucket an outlier — exactly
        # the production shape (one templated page crawled a million
        # times amid a normal corpus).
        n_hot, n_tail = 1_000, 400
        # letter-encode the id (the tokenizer strips digits)
        uid = F.translate(
            F.col("id").cast("string"), "0123456789", "abcdefghij"
        )
        tail = spark.range(n_tail).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("xq"), uid, F.lit(" yq"), uid,
                F.lit(" zq"), uid, F.lit(" wq"), uid,
            ).alias("text"),
        )
        hot = spark.range(10_000, 10_000 + n_hot).select(
            F.col("id").alias("doc_id"),
            F.lit(
                "alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau upsilon"
            ).alias("text"),
        )
        pairs = D.minhash_lsh_candidates(tail.unionAll(hot))
        n_pairs = len(pairs.collect())
        assert n_pairs == n_hot * (n_hot - 1) // 2
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
