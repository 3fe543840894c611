"""Distributed global ranking (operators/ranking.py).

Exactness is proven two ways: (a) differential vs the single-partition
``Window.orderBy`` reference on real data at test scale, (b) the DuckDB
NTILE oracle for ``orders_value_deciles`` in the driver gate. The plan
contract pins the 100 TB property: no single-partition exchange.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)
from parallel_map_reduce_spark.registry import all_queries
from parallel_map_reduce_spark.sources.catalog import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")


def test_global_row_number_matches_window(spark, sf_dir):
    o = _orders(spark, sf_dir)
    got = global_row_number(o, ["o_totalprice", "o_orderkey"], rn_col="rn")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    ref = o.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


def test_global_ntile_matches_window(spark, sf_dir):
    o = _orders(spark, sf_dir)
    for k in (3, 10):
        got = global_ntile(o, ["o_totalprice", "o_orderkey"], k, out_col="t")
        w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
        ref = o.withColumn("t", F.ntile(k).over(w).cast("bigint"))
        assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


def test_global_ntile_n_smaller_than_k(spark, sf_dir):
    # N < k: NTILE gives each row its own tile 1..N (ANSI div-by-zero guard)
    tiny = _orders(spark, sf_dir).orderBy("o_orderkey").limit(4)
    got = global_ntile(tiny, ["o_totalprice", "o_orderkey"], 10, out_col="t")
    tiles = sorted(r["t"] for r in got.select("t").collect())
    assert tiles == [1, 2, 3, 4]


def test_deciles_plan_has_no_single_partition_exchange(spark, sf_dir):
    for name in ("orders_value_deciles", "orders_price_percent_rank"):
        q = all_queries()[name]
        plan = q.build(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, name
        assert "rangepartitioning" not in plan.lower(), name


def test_ranking_stable_across_shuffle_partitions(spark, sf_dir):
    """The decomposition must give the identical total order under any
    parallelism: percentile_approx boundaries may shift bucket SIZES
    with partitioning, but the reconstructed global ranks may not
    change."""
    o = _orders(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got = global_row_number(o, ["o_totalprice", "o_orderkey"], rn_col="rn")
            results.append({(r.o_orderkey, r.rn) for r in got.collect()})
        assert results[0] == results[1]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_global_cumsum_matches_single_window(spark):
    """Range-bucket prefix cumsum must be bit-identical to the
    single-partition window formulation on integer data with a unique
    order key, and its plan must not contain that window's
    SinglePartition exchange."""
    import random

    from pyspark.sql import Window

    from parallel_map_reduce_spark.operators.ranking import global_cumsum

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 5)) for i in range(997)]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    got = {
        r.k: (r.a_cum, r.b_cum)
        for r in global_cumsum(df, "k", ["a", "b"]).collect()
    }
    w = (
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        r.k: (r.ac, r.bc)
        for r in df.select(
            "k", F.sum("a").over(w).alias("ac"), F.sum("b").over(w).alias("bc")
        ).collect()
    }
    assert got == exp
    plan = (
        global_cumsum(df, "k", ["a"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_global_cumsum_nulls_count_as_zero(spark):
    """NULL values must behave as 0 everywhere — the in-window sum used
    to go NULL from a bucket's first NULL row onward while the
    driver-side offsets coalesced the same rows to 0, so buckets after
    a NULL-bearing one silently diverged from buckets before it."""
    import random

    from pyspark.sql import Window

    from parallel_map_reduce_spark.operators.ranking import global_cumsum

    rng = random.Random(11)
    rows = [
        (i, None if rng.random() < 0.3 else rng.randint(0, 50)) for i in range(499)
    ]
    df = spark.createDataFrame(rows, "k INT, a INT")
    got = {r.k: r.a_cum for r in global_cumsum(df, "k", ["a"]).collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exp = {
        r.k: r.ac
        for r in df.select(
            "k", F.sum(F.coalesce("a", F.lit(0))).over(w).alias("ac")
        ).collect()
    }
    assert got == exp
    assert None not in got.values()
