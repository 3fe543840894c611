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


def test_triangle_counts_on_known_graph(spark):
    """K4 plus a pendant vertex and an isolated edge: every K4 vertex
    sits in C(3,2)=3 triangles; the pendant and the isolated edge's
    endpoints sit in none (and are absent from the census)."""
    from parallel_map_reduce_spark.operators.graph import triangle_counts

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    extra = [(4, 5), (6, 7)]  # pendant off the clique + isolated edge
    edges = spark.createDataFrame(k4 + extra, ["a", "b"])
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_star_has_none(spark):
    """A star (maximal degree skew) has wedges everywhere but zero
    triangles — the degree-oriented closure must not fabricate any."""
    from parallel_map_reduce_spark.operators.graph import triangle_counts

    star = [(0, i) for i in range(1, 20)]
    edges = spark.createDataFrame(star, ["a", "b"])
    assert triangle_counts(edges).count() == 0


def test_label_propagation_separates_disjoint_cliques(spark):
    """Two disjoint triangles must land in two different communities,
    each labeled by its smallest member (min tie-break + min-id
    dominance on symmetric cliques)."""
    from parallel_map_reduce_spark.operators.graph import label_propagation

    tri = lambda a, b, c: [(a, b), (b, a), (b, c), (c, b), (a, c), (c, a)]
    edges = spark.createDataFrame(
        tri("a1", "a2", "a3") + tri("b1", "b2", "b3"), "src STRING, dst STRING"
    )
    got = {r.node: r.label for r in label_propagation(edges, iters=4).collect()}
    assert {got["a1"], got["a2"], got["a3"]} == {"a1"}
    assert {got["b1"], got["b2"], got["b3"]} == {"b1"}
