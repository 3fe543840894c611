"""approx_count_distinct: within HLL++ error bounds of the exact count."""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_map_reduce_spark.sources.catalog import load_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r.event_type: r.a
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.05).alias("a"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.15 * n), (k, n, approx[k])


def test_streaming_sliding_users_approx_tolerance(spark, sf_dir):
    """The LIVE streaming entry's n_users_approx must track the batch
    exact per-window distinct-user count within HLL++ tolerance — this
    is the contract that makes streaming_sliding_users_approx a measured
    approximation rather than an unchecked column."""
    from parallel_map_reduce_spark.registry import all_queries

    live = all_queries()["streaming_sliding_users_approx"].build(spark, sf_dir)
    got = {r.window_start_us: (r.n_events, r.n_users_approx) for r in live.collect()}

    e = load_table(spark, sf_dir, "events")
    exact_rows = (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.unix_micros("w.start").alias("ws"), "n_events", "n_users")
        .collect()
    )
    exact = {r.ws: (r.n_events, r.n_users) for r in exact_rows}
    assert set(got) == set(exact)
    for ws, (n_ev, n_exact) in exact.items():
        got_ev, got_approx = got[ws]
        assert got_ev == n_ev, f"window {ws}: event counts diverge"
        assert abs(got_approx - n_exact) <= max(3, 0.15 * n_exact), (
            ws,
            n_exact,
            got_approx,
        )


def test_percentile_approx_within_tolerance(spark, sf_dir):
    """event_value_quantiles_approx must honor the Greenwald-Khanna
    guarantee, which is a RANK bound, not a value bound (in a sparse
    tail, adjacent order statistics can be far apart in value while
    being adjacent in rank): the returned value's true rank must sit
    within ~1/accuracy of the requested percentile."""
    from parallel_map_reduce_spark.registry import all_queries

    approx_rows = (
        all_queries()["event_value_quantiles_approx"].build(spark, sf_dir).collect()
    )
    approx = {(r.event_type, r.p): r.value_approx for r in approx_rows}
    assert approx, "approx quantiles returned nothing"

    e = load_table(spark, sf_dir, "events")
    counts = {r.event_type: r["count"] for r in e.groupBy("event_type").count().collect()}
    for (etype, p), got in approx.items():
        grp = e.filter(F.col("event_type") == etype)
        n = counts[etype]
        n_le = grp.filter(F.col("value") <= got).count()
        rank = n_le / n
        # accuracy=10000 → rank error 1/10000; allow slack for the
        # <=-vs-< boundary on small groups.
        assert abs(rank - p) <= max(0.001, 2.0 / n), (etype, p, got, rank, n)


def test_hll_rollup_tolerance_and_merge_consistency(spark, sf_dir):
    """event_users_hll_rollup: (a) per-type estimate within DataSketches
    HLL tolerance of the exact distinct count, (b) the union of per-day
    sketches estimates the same as a single direct sketch — the
    re-aggregation property that makes the sketch cube valid."""
    from parallel_map_reduce_spark.registry import all_queries

    rolled = {
        r.event_type: r.n_users_est
        for r in all_queries()["event_users_hll_rollup"].build(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(rolled) == set(exact)
    for k, n in exact.items():
        assert abs(rolled[k] - n) <= max(3, 0.1 * n), (k, n, rolled[k])

    direct = {
        r.event_type: r.est
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    for k in exact:
        assert rolled[k] == direct[k], (
            f"{k}: merged-sketch estimate {rolled[k]} != direct {direct[k]}"
        )


def test_rolling_7d_hll_tolerance(spark, sf_dir):
    """Windowed sketch merges must track the exact rolling 7-day
    distinct-user count within HLL tolerance for every day."""
    from parallel_map_reduce_spark.registry import all_queries

    got = {
        r.day: r.n_users_7d_est
        for r in all_queries()["events_rolling_7d_users_hll"].build(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    d = e.select(F.col("day").alias("d")).distinct()
    exact_rows = (
        d.join(e, (F.col("day") <= F.col("d")) & (F.col("day") >= F.date_sub(F.col("d"), 6)))
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    exact = {str(r.d): r.n for r in exact_rows}
    assert set(got) == set(exact)
    for day, n in exact.items():
        assert abs(got[day] - n) <= max(3, 0.1 * n), (day, n, got[day])


def test_hll_overlap_matrix_error_vs_exact(spark, sf_dir):
    """Inclusion-exclusion sketch overlaps must track the exact pairwise
    intersection counts within HLL tolerance (and never go negative)."""
    from itertools import combinations

    from parallel_map_reduce_spark.queries.streaming_batch import (
        event_type_user_overlap_hll,
    )
    from parallel_map_reduce_spark.sources.catalog import load_table

    est = {
        (r.type_a, r.type_b): r.n_overlap_est
        for r in event_type_user_overlap_hll(spark, sf_dir).collect()
    }
    assert est, "no pairs produced"
    users = {
        t: {r.user_id for r in g.collect()}
        for t, g in (
            (t, load_table(spark, sf_dir, "events")
                .filter(F.col("event_type") == t)
                .select("user_id")
                .distinct())
            for t in {k for pair in est for k in pair}
        )
    }
    for (ta, tb), e in est.items():
        exact = len(users[ta] & users[tb])
        assert e >= 0
        # HLL default lgK=12 -> ~1.6% standard error per sketch; the
        # inclusion-exclusion difference amplifies it, so allow 10%
        # relative (or ±5 absolute on tiny overlaps)
        assert abs(e - exact) <= max(5, 0.10 * exact), (ta, tb, e, exact)
