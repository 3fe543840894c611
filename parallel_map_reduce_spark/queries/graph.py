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
from ..sources.catalog import load_table

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
    "rounds with localCheckpoint keeping plans flat (same superstep "
    "discipline as connected_components). Oracle = the identical "
    "update unrolled into chained SQL CTEs; ranks scaled by N and "
    "rounded to 6 dp on both sides (float round-off is ~1e-12). "
    "operators/graph.py:pagerank.",
    tags=("graph", "iterative", "custom-operator"),
)
def trade_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = G.customer_supplier_edges(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    ranks = G.pagerank(edges)
    n = ranks.count()  # == node count; scalar for the output scaling
    return ranks.select(
        "node", F.round(F.col("rank") * n, 6).alias("rank_scaled")
    )
