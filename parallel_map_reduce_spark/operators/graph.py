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

from ..registry import pin

DAMPING = 0.85
PR_ITERS = 5
# Checkpoint the rank vector every K supersteps, not every superstep:
# materializing per iteration cost ~2x wall at sf0.1 (5.4 s -> 2.7 s,
# measured under Spark 4.1.2), and a K-deep tail of 2-join supersteps
# is a perfectly fine plan. K caps lineage depth for large ``iters``;
# rank VALUES are identical either way.
PR_CKPT_EVERY = 8


def _graph_nodes(edges: DataFrame) -> DataFrame:
    """Distinct (node) over both endpoints, materialized (node-sized)."""
    return (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )


def symmetric_nodes(edges: DataFrame) -> DataFrame:
    """Node set of a SYMMETRIZED edge list, materialized (node-sized).

    On a symmetrized list every node appears as src, so distinct(src)
    equals distinct(src ∪ dst) — half the scan and one union arm less
    than ``_graph_nodes`` (guide §2.4: don't compute what a constraint
    already gives you). Callers on the ``symmetric=True`` paths share
    this frame for both the loop init and any node-count scaling, so
    the node set is computed exactly once per query."""
    return (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _pagerank_loop(
    out_edges: DataFrame,
    nodes: DataFrame,
    iters: int,
    ckpt_every: int,
    symmetric: bool = False,
) -> DataFrame:
    """Shared superstep loop over a static (src, dst, deg) table.

    ``symmetric=True`` asserts every node has at least one IN-edge
    (true by construction for symmetrized edge lists, where each node
    appears as both src and dst), which makes the per-round LEFT join
    back onto the node set redundant: the contribution aggregate
    already covers every node, so each superstep is exactly one
    rank-vector join against the static edge table plus one node-keyed
    aggregate — no third exchange. Values are identical to the general
    path (the left join's COALESCE arm never fires on such graphs;
    pinned in tests/test_graph.py)."""
    n = nodes.count()  # scalar metadata, not a data collect
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        contrib = (
            out_edges.join(ranks, out_edges.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        new_rank = (
            F.lit((1.0 - DAMPING) / n)
            + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
        ).alias("rank")
        if symmetric:
            ranks = contrib.select("node", new_rank)
        else:
            ranks = nodes.join(contrib, "node", "left").select("node", new_rank)
        if ckpt_every and (i + 1) % ckpt_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank(
    edges: DataFrame, iters: int = PR_ITERS, ckpt_every: int = PR_CKPT_EVERY
) -> DataFrame:
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
    # scale this is the table to pre-bucket by src (pagerank_prepared +
    # layout.write_bucketed) so supersteps shuffle ranks, never edges.
    out_edges = (
        edges.join(deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
    )
    return _pagerank_loop(out_edges, _graph_nodes(edges), iters, ckpt_every)


def pagerank_prepared(
    out_edges: DataFrame,
    iters: int = PR_ITERS,
    ckpt_every: int = PR_CKPT_EVERY,
    symmetric: bool = False,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """PageRank served from a PRE-MATERIALIZED static (src, dst, deg)
    table — the 100 TB serving shape: the caller writes the edge table
    once, hash-BUCKETED on src (layout.write_bucketed), and every
    superstep's edges⋈ranks join then satisfies its edge-side
    distribution from the bucket layout — the exchanges that remain
    move only node-sized rank vectors, never edges. The degree join is
    paid at write time, not per run. Same fixed-iteration semantics as
    ``pagerank`` (values equal to double-sum round-off; pinned in
    tests/test_graph.py).

    ``nodes`` lets a caller that already materialized the node set (for
    count-based output scaling, say) pass it in instead of paying a
    second derivation; by default ``symmetric=True`` derives it via the
    cheaper distinct-src form (``symmetric_nodes`` — identical set on a
    symmetrized list, half the scan of ``_graph_nodes``)."""
    if nodes is None:
        nodes = symmetric_nodes(out_edges) if symmetric else _graph_nodes(out_edges)
    return _pagerank_loop(out_edges, nodes, iters, ckpt_every, symmetric=symmetric)


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


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles): how many triangles each node participates
    in, over an UNDIRECTED simple graph given as canonical (a < b)
    edge pairs in columns (a, b).

    This is the degree-oriented compact-forward algorithm (Latapy 2008;
    the standard MapReduce formulation is Suri & Vassilvitskii, WWW'11
    "Counting Triangles and the Curse of the Last Reducer"): orient
    every edge from its lower-(degree, id) endpoint to the higher, form
    wedges only among each node's OUT-neighbors, and close them with a
    semi-join against the oriented edge list. Out-degrees are bounded
    by O(sqrt(m)) under this orientation, so wedge fan-out — the thing
    that explodes on skewed graphs when wedges pivot on raw degree —
    is bounded by construction; exactly the last-reducer fix. Each
    triangle is produced exactly once (its three nodes appear in
    strictly increasing (degree, id) order).

    Scale shape: one shuffle to count degrees, one join keyed on the
    wedge pivot, one semi-join keyed on (dst_lo, dst_hi), one explode +
    count. No driver-side state; nodes in no triangle are absent (join
    back against the node set if a dense 0-filled census is needed).

    The input plan is pinned up front (lazy persist; same
    multi-reference discipline as ``pagerank``'s eager checkpoint):
    ``edges`` is referenced ~8 ways downstream (both
    union arms of sym, two degree joins, o1/o2/closing, three corner
    unions), and when the caller passes a non-trivial producer — e.g.
    the MinHash-LSH candidate subplan in ``queries/graph.py`` — the
    physical plan would otherwise re-expand that whole subtree per
    reference (measured: 319 Exchanges at sf0.1 without the
    checkpoint)."""
    edges = pin(edges)
    sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("deg")).withColumnRenamed("u", "node")
    keyed = (
        sym.join(deg, sym.u == deg.node)
        .select("u", "v", F.struct(F.col("deg"), F.col("u").alias("id")).alias("ku"))
        .join(deg.withColumnRenamed("deg", "degv"), F.col("v") == F.col("node"))
        .select(
            "u", "v", "ku", F.struct(F.col("degv").alias("deg"), F.col("v").alias("id")).alias("kv")
        )
    )
    # Orient low-key -> high-key; each undirected edge survives once.
    # Pinned because it is referenced THREE ways below (both wedge
    # arms + the closing semi-join side): without the pin each
    # reference re-expands the sym→deg→keyed subtree (~5 Exchanges a
    # copy — measured 43 vs 13 total at sf0.1). |out| == |edges|, so
    # the materialization is edge-sized, the same class as the input
    # checkpoint above.
    out = pin(keyed.filter(F.col("ku") < F.col("kv")).select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.col("kv").alias("kdst")
    ))
    o1, o2 = out.alias("o1"), out.alias("o2")
    wedges = o1.join(o2, "src").filter(F.col("o1.kdst") < F.col("o2.kdst")).select(
        F.col("src").alias("w_u"),
        F.col("o1.dst").alias("w_v"),
        F.col("o2.dst").alias("w_w"),
    )
    closing = out.select(F.col("src").alias("w_v"), F.col("dst").alias("w_w"))
    tris = wedges.join(closing, ["w_v", "w_w"], "left_semi")
    corners = (
        tris.select(F.col("w_u").alias("node"))
        .union(tris.select(F.col("w_v").alias("node")))
        .union(tris.select(F.col("w_w").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").cast("bigint").alias("n_triangles"))


LPA_ITERS = 4


def label_propagation(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """(node, label): synchronous label-propagation community detection
    (Raghavan et al. 2007) over the DIRECTED edge list (src, dst) —
    pass a symmetrized list for undirected graphs. Init label = own
    node id; each round every node adopts the most frequent label among
    its in-neighbors, ties to the smallest label; isolated nodes keep
    their label. Fixed iteration count and total-order tie-breaks make
    the result a deterministic function of the edge list, so the
    oracle SQL is a literal unrolled transcription (the pagerank
    discipline — queries/graph.py). Synchronous LPA can oscillate on
    bipartite structure; the fixed-round output is still deterministic
    and that caveat is inherent to the published algorithm.

    Per round: one (node, label) exchange for neighbor-label counts,
    one node-keyed exchange for the argmax — label-sized frames only;
    the edge list is joined from its checkpointed static table (never
    recomputed, never re-shuffled wider than the join)."""
    edges = edges.localCheckpoint(eager=True)
    return _lpa_loop(edges, _graph_nodes(edges), iters)


def _lpa_loop(
    edges: DataFrame, nodes: DataFrame, iters: int, symmetric: bool = False
) -> DataFrame:
    """Shared LPA superstep loop over a static (src, dst, ...) table.

    ``symmetric=True`` asserts every node has an in-neighbor (true for
    symmetrized edge lists), collapsing the per-round LEFT join back
    onto the node set: the argmax already covers every node, and the
    isolated-node COALESCE arm can never fire. Values identical to the
    general path on such graphs (pinned in tests/test_graph.py).

    Exchange discipline (VERDICT r8 task 5 — the SCD2 superset-key
    pattern): the joined (node, label) frame is hash-repartitioned on
    ``node`` ONCE per round, and BOTH aggregates then satisfy their
    required distribution from that single exchange — hash(node) covers
    ClusteredDistribution(node, label) because the partitioning keys
    are a subset of the grouping keys. The alternative (let each
    groupBy insert its own exchange) moves map-side-combined
    (node, label) partials twice; combined partials are still bounded
    below by the distinct (node, label) pairs, so the single raw
    exchange never moves more rows than the double one's worst case and
    drops one stage barrier per superstep (8 → ~5 Exchanges at 4
    rounds; plan pinned in tests/test_graph.py)."""
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(iters):
        counts = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .repartition("node")
            .groupBy("node", "label")
            .agg(F.count("*").alias("cnt"))
        )
        winner = counts.groupBy("node").agg(
            F.min_by(
                "label", F.struct((-F.col("cnt")).alias("nc"), F.col("label"))
            ).alias("new_label")
        )
        if symmetric:
            labels = winner.select("node", F.col("new_label").alias("label"))
        else:
            labels = nodes.join(winner, "node", "left").select(
                "node", F.coalesce("new_label", F.col("node")).alias("label")
            )
    return labels


def label_propagation_prepared(
    edges: DataFrame, iters: int = LPA_ITERS, symmetric: bool = False
) -> DataFrame:
    """Label propagation served from a PRE-MATERIALIZED static edge
    table — same serving shape as ``pagerank_prepared``: the caller
    writes the (symmetrized) edge list once, hash-bucketed on src, and
    each round's edges⋈labels join satisfies its edge-side
    distribution from the bucket layout; only label-sized frames move.
    Same fixed-round semantics as ``label_propagation``. On
    ``symmetric=True`` the node set derives via the cheaper
    distinct-src form (``symmetric_nodes`` — identical set on a
    symmetrized list)."""
    nodes = symmetric_nodes(edges) if symmetric else _graph_nodes(edges)
    return _lpa_loop(edges, nodes, iters, symmetric=symmetric)
