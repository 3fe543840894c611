"""Iterative graph analytics as DataFrame ops: PageRank.

Companion to the min-label propagation in ``operators/dedup.py:
connected_components`` — same execution discipline (driver-side loop,
``localCheckpoint`` per round to keep the plan flat, one join + one
group-by per iteration), but propagating NUMERIC mass instead of
labels. The per-round plan is exactly the 100 TB shape: contributions
shuffle on dst (partial-aggregated map-side), ranks re-join on node;
nothing driver-side except the loop counter and the node count.

Reference point: the two-barrier BSP structure of the C++ reference
(``src/tema1.cpp:320-321``) is the same superstep model Pregel-style
graph engines use; here each superstep is one Spark job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
PR_ITERS = 5


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """(node, rank) after ``iters`` synchronous PageRank iterations over
    the DIRECTED edge list (src, dst), uniform 1/N start, damping 0.85.

    Contract: every node must have at least one out-edge (pass a
    symmetrized edge list for undirected graphs) — dangling-mass
    redistribution is deliberately out of scope so the oracle SQL stays
    a literal transcription. Fixed iteration count, no convergence
    check: deterministic output, identical on any engine."""
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # Loop-invariant: (src, dst, deg) never changes across supersteps,
    # so join it ONCE and materialize — each iteration then joins only
    # the node-sized rank vector against this static table. At cluster
    # scale this is also the table to pre-bucket by src so supersteps
    # shuffle ranks, never edges.
    out_edges = (
        edges.join(deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar metadata, not a data collect
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            out_edges.join(ranks, out_edges.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - DAMPING) / n)
                    + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def customer_supplier_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetrized bipartite trade graph: customer c traded with
    supplier s iff some order of c contains a line from s. Node ids are
    prefixed ('c:'/'s:') so the two key spaces cannot collide."""
    pairs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    return pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
