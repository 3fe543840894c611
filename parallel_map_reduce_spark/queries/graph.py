"""Graph-analytics queries with DuckDB oracles.

The PageRank oracle unrolls the fixed iteration count into chained
CTEs generated from the SAME constants as the operator (damping,
iters) — a literal SQL transcription of the synchronous update, so the
two implementations agree to float round-off (output scaled by N and
rounded to 6 dp on both sides)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph as G
from ..registry import register
from ..sources.catalog import load_table, read_parquet


GRAPH_BUCKETS = 16


def _bucketed_graph_table(
    spark: SparkSession, sf_dir: str, name, build_edges, source_files
) -> DataFrame:
    """The static (src, dst, deg) superstep table for a graph family,
    built ONCE per source version as a 16-bucket hash-bucketed file set
    on ``src`` (operators/layout.py:write_bucketed into an atomically
    published cache dir — sources/artifact_cache.py) and REGISTERED in
    each session's catalog over those cached files via bucketed DDL —
    VERDICT r7 task 1: with the edge side's distribution satisfied by
    the bucket layout, every PageRank/LPA superstep join exchanges only
    the node-sized rank/label vector, never the edges; the degree join
    and the bucket shuffle are paid once at write time and amortize
    over every session (the same write-once/serve-many split as the
    LSH edge artifact and the ANN index stores). Bucket identity of a
    re-registered file set is carried by the writer's file-name bucket
    suffixes; join-content equality of the re-registered table is
    pinned in tests/test_graph.py."""
    import os
    import re

    from ..operators.layout import ensure_bucketed_table
    from ..sources.artifact_cache import source_key

    tag = re.sub(r"[^a-z0-9]+", "_", os.path.basename(sf_dir.rstrip("/")).lower())

    def out_edges() -> DataFrame:
        edges = build_edges()
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        return edges.join(deg, "src").select("src", "dst", "deg")

    return spark.table(
        ensure_bucketed_table(
            spark,
            f"pmrs_b_{name}_{tag}",
            "pmrs_bucketed_graph",
            source_key(name, sf_dir, source_files),
            out_edges,
            "src",
            GRAPH_BUCKETS,
        )
    )

_EDGES_CTE = """
pairs AS (
    SELECT DISTINCT 'c:' || o_custkey AS a, 's:' || l_suppkey AS b
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
sym AS (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM sym),
nn AS (SELECT COUNT(*) AS n FROM nodes)
"""


def _pagerank_sql(iters: int) -> str:
    steps = ["pr0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"]
    for i in range(1, iters + 1):
        steps.append(
            f"""pr{i} AS (
    SELECT nodes.node,
           {1.0 - G.DAMPING} / nn.n + {G.DAMPING} * COALESCE(c.contrib, 0.0) AS rank
    FROM nodes CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS node, SUM(p.rank / deg.d) AS contrib
        FROM sym e JOIN pr{i - 1} p ON p.node = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst
    ) c ON c.node = nodes.node
)"""
        )
    return ",\n".join(steps)


@register(
    "trade_graph_pagerank",
    oracle=f"""
WITH {_EDGES_CTE},
{_pagerank_sql(G.PR_ITERS)}
SELECT p.node, ROUND(p.rank * nn.n, 6) AS rank_scaled
FROM pr{G.PR_ITERS} p CROSS JOIN nn
""",
    doc=f"PageRank ({G.PR_ITERS} synchronous iterations, damping "
    f"{G.DAMPING}) over the symmetrized customer-supplier trade graph — "
    "iterative numeric propagation as a driver loop of join+group-by "
    "supersteps served from the SHARED bucketed (src, dst, deg) edge "
    "table (_bucketed_graph_table): the edge side of every superstep "
    "join reads its bucket layout, so the exchanges that remain move "
    "only node-sized rank vectors; symmetric=True elides the per-round "
    "left join (symmetrized graphs have no contribution-less nodes). "
    "Oracle = the identical update unrolled into chained SQL CTEs; "
    "ranks scaled by N and rounded to 6 dp on both sides (float "
    "round-off is ~1e-12). operators/graph.py:pagerank_prepared.",
    tags=("graph", "iterative", "custom-operator"),
)
def trade_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_edges = _bucketed_trade_edges(spark, sf_dir)
    # ONE node-set derivation for both the loop init and the output
    # scaling (r17 opt, guide §2.4): the checkpointed distinct-src
    # frame is shared, where previously the build ran distinct(src∪dst)
    # + checkpoint for the loop AND a second distinct(src) + count for
    # the scaling — two edge-table distinct jobs collapsed into one
    # (~0.65 s of the 3.3 s warm wall at sf0.1/local[32]).
    nodes = G.symmetric_nodes(out_edges)
    n = nodes.count()
    ranks = G.pagerank_prepared(out_edges, symmetric=True, nodes=nodes)
    return ranks.select(
        "node", F.round(F.col("rank") * n, 6).alias("rank_scaled")
    )


def _bucketed_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bucketed_graph_table(
        spark,
        sf_dir,
        "trade_edges",
        lambda: G.customer_supplier_edges(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        ),
        ["orders.parquet", "lineitem.parquet"],
    )


def _neardup_triangle_oracle() -> str:
    # Import here, not at module top: queries modules are imported as a
    # package side effect and a top-level circular import would be easy
    # to trip. The pairs CTE is the SAME SQL the LSH pair oracle runs.
    from .dedup import LSH_PAIRS_CTES

    return f"""
WITH {LSH_PAIRS_CTES},
tri AS (
    SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
    FROM lsh_pairs e1
    JOIN lsh_pairs e2 ON e2.doc_a = e1.doc_b
    JOIN lsh_pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT node::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_triangles
FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
GROUP BY node
"""


@register(
    "neardup_triangle_census",
    oracle=_neardup_triangle_oracle(),
    doc="Triangle census over the MinHash-LSH near-dup candidate graph: "
    "documents whose candidate pairs close into triangles are MUTUALLY "
    "similar triples — the strongest transitive-duplication signal, and "
    "a validation of LSH clustering quality. The operator is the "
    "degree-oriented compact-forward algorithm (wedges pivot only on "
    "each node's out-neighbors under (degree, id) orientation, bounding "
    "fan-out by O(sqrt(m)) — Suri & Vassilvitskii's last-reducer fix); "
    "the oracle is the independent id-oriented 3-way self-join. The "
    "edge list is served from the SHARED persisted candidate artifact "
    "(queries/dedup.py:ensure_lsh_edges — built once per sf_dir), so "
    "this query's plan starts at a parquet scan of edges, not at "
    "re-shingling the corpus. operators/graph.py:triangle_counts.",
    tags=("graph", "dedup", "custom-operator"),
)
def neardup_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import ensure_lsh_edges

    edges = read_parquet(spark, ensure_lsh_edges(spark, sf_dir)).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return G.triangle_counts(edges).select(
        F.col("node").alias("doc_id"), "n_triangles"
    )




def _lpa_sql(iters: int) -> str:
    steps = ["lp0 AS (SELECT node, node AS label FROM nodes)"]
    for i in range(1, iters + 1):
        steps.append(
            f"""lp{i} AS (
    SELECT n.node, COALESCE(w.label, n.node) AS label
    FROM nodes n LEFT JOIN (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY cnt DESC, label ASC) AS rn
            FROM (
                SELECT e.dst AS node, p.label, COUNT(*) AS cnt
                FROM sym e JOIN lp{i - 1} p ON p.node = e.src
                GROUP BY 1, 2
            )
        ) WHERE rn = 1
    ) w ON w.node = n.node
)"""
        )
    return ",\n".join(steps)


@register(
    "trade_graph_communities_lpa",
    oracle=f"""
WITH {_EDGES_CTE},
{_lpa_sql(G.LPA_ITERS)}
SELECT node, label AS community FROM lp{G.LPA_ITERS}
""",
    doc=f"Label-propagation community detection ({G.LPA_ITERS} "
    "synchronous rounds, most-frequent-neighbor-label update, ties to "
    "the smallest label) over the symmetrized customer-supplier trade "
    "graph — the integer-exact sibling of pagerank's numeric "
    "propagation: same driver superstep loop, same SHARED bucketed "
    "edge table (the pagerank entry's artifact — written once, served "
    "twice), per-round exchanges carry only label-sized frames. "
    "Total-order tie-breaks make the output deterministic, so the "
    "oracle is the identical update unrolled into chained CTEs (no "
    "rounding slop at all — labels are strings). "
    "operators/graph.py:label_propagation_prepared.",
    tags=("graph", "iterative", "community", "custom-operator"),
)
def trade_graph_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_edges = _bucketed_trade_edges(spark, sf_dir)
    return G.label_propagation_prepared(out_edges, symmetric=True).select(
        "node", F.col("label").alias("community")
    )

def _neardup_lpa_oracle() -> str:
    from .dedup import LSH_PAIRS_CTES

    return f"""
WITH {LSH_PAIRS_CTES},
sym AS (
    SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
nodes AS (SELECT DISTINCT src AS node FROM sym),
{_lpa_sql(G.LPA_ITERS)}
SELECT node::BIGINT AS doc_id, label::BIGINT AS community
FROM lp{G.LPA_ITERS}
"""


@register(
    "neardup_communities_lpa",
    oracle=_neardup_lpa_oracle(),
    doc=f"Label-propagation communities ({G.LPA_ITERS} synchronous "
    "rounds, ties to the smallest label) over the MinHash-LSH near-dup "
    "candidate graph — near-duplicate CLUSTERS rather than pairs, the "
    "document-side sibling of the trade-graph LPA entry. Served from "
    "the SHARED persisted edge artifact (queries/dedup.py:"
    "ensure_lsh_edges), symmetrized and re-bucketed ONCE on src "
    "(_bucketed_graph_table) so each superstep join exchanges only the "
    "label vector; integer doc-id labels keep the update "
    "integer-exact, and the oracle replays the identical rounds as "
    "unrolled CTEs over the same LSH-pair SQL the pair/triangle "
    "oracles use. operators/graph.py:label_propagation_prepared.",
    tags=("graph", "dedup", "iterative", "community", "custom-operator"),
)
def neardup_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _sym_lsh_edges() -> DataFrame:
        from .dedup import ensure_lsh_edges

        pairs = read_parquet(spark, ensure_lsh_edges(spark, sf_dir))
        return pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )

    edges = _bucketed_graph_table(
        spark, sf_dir, "neardup_edges", _sym_lsh_edges, ["documents.parquet"]
    )
    return G.label_propagation_prepared(edges, symmetric=True).select(
        F.col("node").alias("doc_id"), F.col("label").alias("community")
    )
