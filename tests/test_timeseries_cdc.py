"""Contracts for the grouped time-series operators and the CDC MERGE.

Each operator's registry entry already hash-matches a DuckDB oracle;
these tests pin the properties the oracle can't see — agreement with an
independent numpy/python replica, merge precedence rules, and the
renormalization semantics at series edges.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators.cdc import merge_changes
from parallel_map_reduce_spark.operators.timeseries import (
    ewma_weights,
    group_ewma,
    group_ols,
)


def test_group_ols_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for grp, slope, icept in [("a", 0.5, 10.0), ("b", -2.0, 3.0)]:
        xs = rng.integers(0, 100_000, size=400)
        for x in xs:
            noise = float(rng.normal(0, 5))
            rows.append(
                Row(g=grp, x=int(x), y=round(float(slope * x) / 3600.0 + icept + noise, 4))
            )
    df = spark.createDataFrame(rows)
    out = {
        r["g"]: r
        for r in group_ols(
            df, ["g"], F.col("x"), F.col("y"), x_scale=3600.0
        ).collect()
    }
    for grp in ("a", "b"):
        sub = [(r.x, r.y) for r in rows if r.g == grp]
        xs = np.array([x for x, _ in sub], dtype=float)
        ys = np.array([y for _, y in sub], dtype=float)
        ref_slope, ref_icept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        got = out[grp]
        assert got["n"] == len(sub)
        assert got["slope"] == pytest.approx(ref_slope * 3600.0, abs=1e-4)
        assert got["intercept"] == pytest.approx(ref_icept, abs=1e-3)
        assert got["r2"] == pytest.approx(r * r, abs=1e-5)


def test_ewma_weights_are_exact_geometric():
    ws = [float(w) for w in ewma_weights(0.3, 12)]
    assert ws[0] == pytest.approx(0.3)
    for k in range(1, 12):
        assert ws[k] == pytest.approx(ws[k - 1] * 0.7, rel=1e-12)


def test_group_ewma_matches_python_replica_and_renormalizes(spark):
    # Hours 0..9 with a GAP at hour 5: rows at the gap's right edge must
    # renormalize over the present terms only.
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    hours = [0, 1, 2, 3, 4, 6, 7, 8, 9]
    vals = {h: float(10 + 3 * h) for h in hours}
    df = spark.createDataFrame(
        [
            Row(g="a", h=base + dt.timedelta(hours=h), x=vals[h])
            for h in hours
        ]
    ).select("g", "h", F.col("x").cast("decimal(18,4)").alias("x"))
    out = {
        r["h"].hour: r
        for r in group_ewma(df, ["g"], "h", "x", alpha=0.3, lookback=4).collect()
    }
    assert set(out) == set(hours)
    ws = [float(w) for w in ewma_weights(0.3, 4)]
    for h in hours:
        terms = [(ws[k], vals[h - k]) for k in range(4) if (h - k) in vals]
        expect = sum(w * v for w, v in terms) / sum(w for w, _ in terms)
        assert out[h]["n_terms"] == len(terms)
        assert out[h]["ewma"] == pytest.approx(expect, abs=1e-5)
    # the row just after the gap has a missing lag-1 term
    assert out[6]["n_terms"] == 3


def _feed(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, seq=s, op=o, v=v) for k, s, o, v in rows]
    )


def test_merge_changes_precedence_and_tombstones(spark):
    snap = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")])
    feed = _feed(
        spark,
        [
            (1, 1, "U", "a1"),
            (1, 2, "U", "a2"),  # later generation wins
            (2, 1, "U", "b1"),
            (2, 2, "D", None),  # delete beats earlier update
            (4, 1, "I", "d"),  # insert of a new key
        ],
    )
    out = {r["k"]: r for r in merge_changes(snap, feed, ["k"]).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["v"] == "a2" and out[1]["op"] == "U"
    assert out[3]["v"] == "c" and out[3]["op"] == "K"  # untouched snapshot row
    assert out[4]["v"] == "d" and out[4]["op"] == "I"


def test_merge_changes_is_one_exchange(spark):
    """The MERGE plan must be union + a single aggregate exchange —
    not the window-compact + join two-shuffle shape."""
    snap = spark.range(100).select(
        F.col("id").alias("k"), F.lit("x").alias("v")
    )
    feed = snap.limit(10).select(
        "k", F.lit(1).alias("seq"), F.lit("U").alias("op"), F.lit("y").alias("v")
    )
    plan = (
        merge_changes(snap, feed, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # partial agg + final agg exchange
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_mi_entry_information_identities(spark, sf_dir):
    """MI >= 0, MI <= min(H(seg), H(nat)) — the identities any correct
    estimator satisfies; plus entropies bounded by log2(cardinality)."""
    from parallel_map_reduce_spark.registry import all_queries

    row = all_queries()["customer_segment_nation_mi"].build(spark, sf_dir).collect()[0]
    assert row["mi_bits"] >= 0.0
    assert row["mi_bits"] <= min(row["h_segment_bits"], row["h_nation_bits"]) + 1e-6
    assert row["h_segment_bits"] <= math.log2(5) + 1e-6  # 5 market segments
    assert row["h_nation_bits"] <= math.log2(25) + 1e-6  # 25 nations


def test_group_holt_matches_float_replica_and_partitioning_invariant(spark):
    """Holt decimal recursion ~= plain float Holt (tolerance — the 6-dp
    quantization is the only divergence), and output is identical under
    adversarial input partitioning (applyInPandas sorts per group)."""
    import datetime as dt

    from parallel_map_reduce_spark.operators.timeseries import group_holt

    base = dt.datetime(2024, 1, 1)
    rows = []
    vals = {}
    rng = np.random.default_rng(11)
    for g in ("a", "b"):
        for h in range(50):
            v = round(float(100 + 5 * h + rng.normal(0, 10)), 4)
            vals[(g, h)] = v
            rows.append(Row(g=g, h=base + dt.timedelta(hours=h), x=v))
    df = spark.createDataFrame(rows).select(
        "g", "h", F.col("x").cast("decimal(18,4)").alias("x")
    )
    out = {
        (r["g"], r["h"].hour + 24 * (r["h"].day - 1)): r
        for r in group_holt(df, "g", "h", "x").collect()
    }
    a, b = 0.5, 0.3
    for g in ("a", "b"):
        level, trend = vals[(g, 0)], 0.0
        assert out[(g, 0)]["level"] == pytest.approx(level, abs=1e-5)
        for h in range(1, 50):
            prev = level
            level = a * vals[(g, h)] + (1 - a) * (prev + trend)
            trend = b * (level - prev) + (1 - b) * trend
            got = out[(g, h)]
            assert got["level"] == pytest.approx(level, abs=1e-3)
            assert got["trend"] == pytest.approx(trend, abs=1e-3)
            assert got["forecast_next"] == pytest.approx(
                got["level"] + got["trend"], abs=1e-9
            )
    shuffled = df.repartition(7, "h")  # group rows scattered across tasks
    out2 = sorted(map(tuple, group_holt(shuffled, "g", "h", "x").collect()))
    assert out2 == sorted(map(tuple, group_holt(df, "g", "h", "x").collect()))


def test_snapshot_diff_roundtrip_law(spark, sf_dir):
    """merge(old, diff(old, new)) == new — the algebraic pair contract
    between the two CDC operators, on the real fixture feed."""
    from parallel_map_reduce_spark.operators.cdc import merge_changes, snapshot_diff
    from parallel_map_reduce_spark.queries.relational import cdc_feed, cdc_snapshot
    from parallel_map_reduce_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    old = cdc_snapshot(o).withColumn("price", F.col("price").cast("decimal(21,5)"))
    new = merge_changes(
        cdc_snapshot(o), cdc_feed(o), ["o_orderkey"], seq_col="seq", op_col="op"
    ).drop("op")
    d = snapshot_diff(old, new, ["o_orderkey"])
    feed2 = d.withColumn("seq", F.lit(1).cast("bigint"))
    rebuilt = merge_changes(old, feed2, ["o_orderkey"], seq_col="seq", op_col="op").drop(
        "op"
    )
    a = sorted(map(tuple, rebuilt.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b


def test_snapshot_diff_empty_on_identical(spark):
    from parallel_map_reduce_spark.operators.cdc import snapshot_diff

    snap = spark.createDataFrame([(1, "a", None), (2, None, "x")], "k INT, u STRING, v STRING")
    assert snapshot_diff(snap, snap, ["k"]).count() == 0  # null-safe compare


def test_snapshot_diff_payload_column_named_present(spark):
    """A payload column literally named 'present' must not collide with
    the operator's internal presence markers (advisor r7: it renamed to
    '_o_present', colliding with the old marker name — now the markers
    are '__o_present__', unreachable by any '_o_'+c rename)."""
    from parallel_map_reduce_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, True), (2, False)], "k INT, present BOOLEAN"
    )
    new = spark.createDataFrame(
        [(1, False), (3, True)], "k INT, present BOOLEAN"
    )
    d = {r["k"]: (r["op"], r["present"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert d == {1: ("U", False), 2: ("D", False), 3: ("I", True)}


def test_column_profile_invariants(spark, sf_dir):
    from parallel_map_reduce_spark.registry import all_queries

    rows = all_queries()["lineitem_column_profile"].build(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_nulls"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"] - r["n_nulls"]
        assert r["min_value"] is not None and r["max_value"] is not None
    byname = {r["column_name"]: r for r in rows}
    q = byname["l_quantity"]
    assert float(q["min_value"]) <= float(q["max_value"])
    assert byname["l_shipdate"]["min_value"] <= byname["l_shipdate"]["max_value"]


def test_session_metrics_identities(spark, sf_dir):
    from parallel_map_reduce_spark.registry import all_queries

    r = all_queries()["events_session_metrics"].build(spark, sf_dir).collect()[0]
    assert r["n_sessions"] > 0
    assert r["avg_events_per_session"] == pytest.approx(
        r["n_events"] / r["n_sessions"], abs=1e-5
    )
    assert 0.0 <= r["bounce_rate"] <= 1.0
    assert r["avg_duration_s"] >= 0.0


def test_capped_funnel_greedy_deadline_semantics(spark):
    """The deadline predicate: a click outside the window never counts,
    a later in-window-looking click does NOT re-anchor (greedy), and
    the purchase window anchors on the MATCHED click."""
    import datetime as dt

    from parallel_map_reduce_spark.operators.funnel import (
        funnel_first_completion_capped,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, mins, et):
        return Row(user_id=uid, ts=t0 + dt.timedelta(minutes=mins), event_type=et)

    cap_us = 60 * 60 * 1_000_000  # 1h per step
    rows = [
        # u1: clean conversion inside both windows
        ev(1, 0, "view"), ev(1, 30, "click"), ev(1, 80, "purchase"),
        # u2: click misses its window; later events cannot resurrect it
        ev(2, 0, "view"), ev(2, 90, "click"), ev(2, 100, "purchase"),
        # u3: first click in-window, purchase within window of THAT click
        # (95m after view — fails only if the purchase window anchored
        # on the view instead of the click)
        ev(3, 0, "view"), ev(3, 50, "click"), ev(3, 95, "purchase"),
        # u4: purchase outside the click's window
        ev(4, 0, "view"), ev(4, 10, "click"), ev(4, 200, "purchase"),
    ]
    out = {
        r["user_id"]: r
        for r in funnel_first_completion_capped(
            spark.createDataFrame(rows), cap_us
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[3]["click_ts_us"] - out[3]["view_ts_us"] == 50 * 60 * 1_000_000
