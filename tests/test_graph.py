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


def _random_sym_edges(spark, n_nodes=40, seed=7):
    """Deterministic symmetrized random edge list (no Spark rand())."""
    import random

    rng = random.Random(seed)
    pairs = {
        tuple(sorted(rng.sample(range(n_nodes), 2))) for _ in range(3 * n_nodes)
    }
    rows = [(f"n{a}", f"n{b}") for a, b in pairs]
    df = spark.createDataFrame(rows, ["src", "dst"])
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_prepared_symmetric_equals_general(spark):
    """pagerank_prepared(symmetric=True) over a pre-materialized
    (src, dst, deg) table must produce the same ranks as the general
    path to float round-off — the left-join COALESCE arm never fires
    on a symmetrized graph and the superstep arithmetic is unchanged;
    the only difference is double-sum reassociation under the changed
    source partitioning (last-ulp, absorbed by the registry entry's
    6 dp rounding)."""
    from parallel_map_reduce_spark.operators.graph import pagerank_prepared

    edges = _random_sym_edges(spark)
    base = {r.node: r.rank for r in pagerank(edges).collect()}
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    out_edges = edges.join(deg, "src").select("src", "dst", "deg")
    prep = {r.node: r.rank for r in pagerank_prepared(out_edges, symmetric=True).collect()}
    assert set(prep) == set(base)
    for k, v in base.items():
        assert abs(prep[k] - v) <= 1e-12 * max(abs(v), 1e-30), (k, prep[k], v)


def test_lpa_prepared_symmetric_equals_general(spark):
    from parallel_map_reduce_spark.operators.graph import (
        label_propagation,
        label_propagation_prepared,
    )

    edges = _random_sym_edges(spark, seed=11)
    base = {r.node: r.label for r in label_propagation(edges).collect()}
    prep = {
        r.node: r.label
        for r in label_propagation_prepared(edges, symmetric=True).collect()
    }
    assert prep == base


def test_lpa_superstep_pays_one_exchange_per_round(spark, tmp_path):
    """VERDICT r8 task 5: the per-round (node, label) count and the
    node-keyed argmax must satisfy their distribution from ONE shared
    hash(node) exchange — hash(node) covers ClusteredDistribution
    (node, label) because the partitioning keys are a subset of the
    grouping keys (the SCD2 superset-key discipline). Served from the
    bucketed edge table (the gate entries' shape) with broadcast off
    and shuffle partitions pinned to the bucket count, a 4-round
    symmetric plan carries exactly 5 hash exchanges: the initial label
    frame into the first join, then ONE repartition per round — the
    pre-fix plan paid 2 aggregate exchanges per round on top."""
    from parallel_map_reduce_spark.operators.graph import (
        label_propagation_prepared,
    )
    from parallel_map_reduce_spark.operators.layout import write_bucketed

    edges = _random_sym_edges(spark, seed=23)
    write_bucketed(
        edges, "pmrs_test_lpa_edges", "src", 8, path=str(tmp_path / "edges")
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        df = label_propagation_prepared(
            spark.table("pmrs_test_lpa_edges"), iters=4, symmetric=True
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.sql("DROP TABLE IF EXISTS pmrs_test_lpa_edges")
    assert plan.count("Exchange hashpartitioning") == 5, plan
    # the single per-round exchange is the explicit repartition; the
    # two aggregates never insert their own
    assert plan.count("REPARTITION_BY_COL") == 4, plan


def test_bucketed_superstep_join_has_no_edge_side_exchange(spark, sf_dir, tmp_path):
    """The VERDICT r7 task-1 property: with the (src, dst, deg) table
    bucketed on src, a superstep join planned as SMJ (broadcast
    disabled) satisfies the edge side's distribution from the bucket
    layout — the ONLY hash exchanges in a one-iteration plan are the
    node-sized rank-vector shuffle into the join and the node-keyed
    contribution aggregate; the bucketed scan feeds the join directly."""
    from parallel_map_reduce_spark.operators.graph import pagerank_prepared
    from parallel_map_reduce_spark.operators.layout import write_bucketed

    edges = _random_sym_edges(spark, seed=13)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    write_bucketed(
        edges.join(deg, "src").select("src", "dst", "deg"),
        "pmrs_test_graph_edges",
        "src",
        8,
        path=str(tmp_path / "edges"),
    )
    out_edges = spark.table("pmrs_test_graph_edges")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = pagerank_prepared(out_edges, iters=1, symmetric=True)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS pmrs_test_graph_edges")
    assert plan.count("SortMergeJoin") == 1, plan
    assert "Bucketed: true" in plan, plan
    # Exactly 2 hash exchanges: ranks into the join, contributions into
    # the aggregate — and neither sits on the bucketed-scan side.
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_bucketed_ddl_reregistration_preserves_buckets_and_content(spark, tmp_path):
    """Cross-session serving contract for _bucketed_graph_table: a
    bucketed file set written by one session and RE-REGISTERED over the
    same files via CLUSTERED BY DDL (in-memory catalog, new session)
    must (a) join-match the original frame row-for-row and (b) still
    satisfy the join's edge-side distribution from the bucket layout —
    bucket identity rides the writer's file-name suffixes."""
    from parallel_map_reduce_spark.operators.layout import write_bucketed

    edges = _random_sym_edges(spark, seed=17)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    out = edges.join(deg, "src").select("src", "dst", "deg")
    path = str(tmp_path / "edges")
    write_bucketed(out, "pmrs_test_ddl_build", "src", 8, path=path)
    spark.sql("DROP TABLE pmrs_test_ddl_build")  # external: files stay

    spark.sql(
        "CREATE TABLE pmrs_test_ddl_serve (src STRING, dst STRING, deg BIGINT) "
        "USING parquet CLUSTERED BY (src) SORTED BY (src) INTO 8 BUCKETS "
        f"LOCATION '{path}'"
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        t = spark.table("pmrs_test_ddl_serve")
        probe = edges.select("src").distinct().withColumn("r", F.lit(1.0))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # Pin shuffle partitions to the bucket count so the probe's
        # distinct lands already bucket-compatible — the single-exchange
        # assertion must not depend on ambient session conf.
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        j = t.join(probe, "src")
        plan = j._jdf.queryExecution().executedPlan().toString()
        got = sorted(map(tuple, j.select("src", "dst", "deg").collect()))
        want = sorted(map(tuple, out.join(probe, "src").select("src", "dst", "deg").collect()))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.sql("DROP TABLE pmrs_test_ddl_serve")
    assert got == want and len(got) > 0
    assert "Bucketed: true" in plan
    assert plan.count("SortMergeJoin") == 1
    # one exchange only — the probe side; the bucketed scan feeds the
    # join directly
    assert plan.count("Exchange hashpartitioning") == 1, plan
