"""PageRank invariants (operators/graph.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_map_reduce_spark.operators.graph import (
    customer_supplier_edges,
    pagerank,
)
from parallel_map_reduce_spark.sources.catalog import load_table


def test_pagerank_conserves_mass_and_is_positive(spark, sf_dir):
    """With no dangling nodes (symmetrized graph), total rank mass stays
    1 and every rank is at least the teleport floor (1-d)/N."""
    edges = customer_supplier_edges(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    ranks = pagerank(edges)
    n = ranks.count()
    row = ranks.agg(
        F.sum("rank").alias("mass"), F.min("rank").alias("lo")
    ).first()
    assert abs(row["mass"] - 1.0) < 1e-9, row["mass"]
    assert row["lo"] >= 0.15 / n - 1e-12, (row["lo"], n)


def test_pagerank_ranks_hubs_higher(spark, sf_dir):
    """A supplier connected to more customers must outrank one with
    fewer (monotonicity on degree for the bipartite graph's hub side)."""
    edges = customer_supplier_edges(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    ranks = pagerank(edges)
    deg = edges.groupBy(F.col("src").alias("node")).count()
    j = ranks.join(deg, "node").filter(F.col("node").startswith("s:"))
    top_by_deg = j.orderBy(F.desc("count")).first()
    bottom_by_deg = j.orderBy(F.asc("count")).first()
    assert top_by_deg["rank"] > bottom_by_deg["rank"]
