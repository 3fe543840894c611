"""Bucketed co-located join: the shuffle-free big-join strategy.

At 100 TB the orders↔lineitem join shuffles both fact tables on every
run; bucketing both by the join key at write time pre-co-locates them so
the join needs NO Exchange at read time — paid once at ingest, amortized
over every subsequent join. This test writes both tables bucketed by
orderkey, asserts the join plan has zero Exchanges, and that results
equal the plain shuffle join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parallel_map_reduce_spark.sources.catalog import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # warehouse.dir is a static conf; explicit per-table paths (external
    # tables) avoid needing it.
    wh = str(tmp_path_factory.mktemp("warehouse"))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    for name, df, key in (("li_b", li, "l_orderkey"), ("o_b", o, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_b, o_b = bucketed_tables
    # disable auto-broadcast so the plan shows what happens when BOTH
    # sides are fact-sized (the case bucketing exists for)
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_b)
            .join(spark.table(o_b), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("total"),
            )
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    # below the join: only the two bucketed scans — zero Exchanges
    assert "Exchange" not in join_part, "join inputs shuffled despite bucketing"
    assert join_part.count("Bucketed: true") == 2


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li_b, o_b = bucketed_tables

    def agg(df_li, df_o):
        return {
            (r.o_orderstatus, r.n, str(r.total))
            for r in df_li.join(df_o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("total"),
            )
            .collect()
        }

    bucketed = agg(spark.table(li_b), spark.table(o_b))
    plain = agg(load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders"))
    assert bucketed == plain and len(bucketed) > 0
