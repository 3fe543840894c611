"""Recorded tolerance witnesses for the sketch-family registry entries
(VERDICT r13 task 1 — the last evidence gap in the parity program).

HLL / Greenwald-Khanna / inclusion-exclusion estimates are approximate
BY DESIGN, so they can never carry a DuckDB hash oracle (the driver's
checker is exact-diff) and have no independent-path twin (re-running
the sketch reproduces the same estimate — that proves determinism, not
accuracy). What CAN be recorded per rotation is the published error
bound and the worst error actually observed against the EXACT quantity:
the same bounds tests/test_approx.py enforces, restated here so
tools/parity.py RECORDS them per entry (``tolerance-matched (vs
<exact label>): bound ..., observed ...``) the way twin identity is
recorded — every one of the registry's entries then carries an
oracle, twin, or tolerance grade; bare rows-only = 0.

Each witness receives the entry's already-collected rows and computes
the matching exact quantity (countDistinct, rank positions, exact set
intersections — fixture-scale jobs; the sketches exist precisely
because these exact forms do not scale to 100 TB). Columns that are
exact by construction (event counts, window day counts) are checked
for EQUALITY inside the same witness, so a sketch entry's exact
columns get no slack.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# entry name -> (label of the exact comparison, witness). A witness
# returns {"ok": bool, "bound": str, "observed": str, "detail": str};
# parity fails the entry when ok is False and records bound+observed
# either way.
TOLERANCE: dict[
    str, tuple[str, Callable[[SparkSession, str, list, list], dict]]
] = {}


def _witness(name: str, label: str):
    def deco(fn):
        TOLERANCE[name] = (label, fn)
        return fn

    return deco


def _ratio_record(worst: float, worst_key, bound: str, errs: dict) -> dict:
    """Shared shape: worst observed error as a fraction of its allowed
    bound (<= 1.0 passes), plus the absolute error at the worst key."""
    abs_err, allowed = errs[worst_key]
    return {
        "ok": worst <= 1.0,
        "bound": bound,
        "observed": (
            f"worst |err|={abs_err:g} at {worst_key!r} "
            f"({worst:.0%} of its allowed {allowed:g})"
        ),
        "detail": f"{len(errs)} groups checked",
    }


def _bounded_keyed(
    approx: dict, exact: dict, allowed: Callable[[float], float], bound: str
) -> dict:
    """Compare keyed estimates to keyed exact values under a per-key
    absolute allowance; key sets must match exactly."""
    if set(approx) != set(exact):
        missing = set(exact) ^ set(approx)
        return {
            "ok": False,
            "bound": bound,
            "observed": f"KEY SETS DIVERGE ({len(missing)} differ)",
            "detail": repr(sorted(missing)[:3]),
        }
    errs = {
        k: (abs(approx[k] - exact[k]), allowed(exact[k])) for k in exact
    }
    worst_key = max(errs, key=lambda k: errs[k][0] / errs[k][1])
    worst = errs[worst_key][0] / errs[worst_key][1]
    return _ratio_record(worst, worst_key, bound, errs)


@_witness(
    "event_type_distinct_users_approx",
    "exact per-type count(distinct user_id)",
)
def _distinct_users(spark, sf_dir, srows, scols) -> dict:
    i = {c: j for j, c in enumerate(scols)}
    approx = {r[i["event_type"]]: r[i["n_users_approx"]] for r in srows}
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    return _bounded_keyed(
        approx, exact, lambda n: max(3, 0.15 * n),
        "HLL++ rsd=0.05: |err| <= max(3, 0.15n)",
    )


@_witness(
    "event_value_quantiles_approx",
    "true rank of each returned quantile value",
)
def _quantile_ranks(spark, sf_dir, srows, scols) -> dict:
    """Greenwald-Khanna guarantees a RANK bound, not a value bound:
    the returned value's true rank must sit within ~1/accuracy of the
    requested percentile (slack for the <=-vs-< boundary on small
    groups, as in tests/test_approx.py). One Spark job: broadcast the
    ~|types|x3 approx rows onto events and count values <= v."""
    i = {c: j for j, c in enumerate(scols)}
    got = spark.createDataFrame(
        [
            (r[i["event_type"]], float(r[i["p"]]), float(r[i["value_approx"]]))
            for r in srows
        ],
        "event_type STRING, p DOUBLE, v DOUBLE",
    )
    e = load_table(spark, sf_dir, "events")
    counted = (
        e.join(F.broadcast(got), "event_type")
        .groupBy("event_type", "p", "v")
        .agg(
            F.sum((F.col("value") <= F.col("v")).cast("long")).alias("n_le"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    errs = {}
    for r in counted:
        rank = r["n_le"] / r["n"]
        errs[(r["event_type"], r["p"])] = (
            abs(rank - r["p"]),
            max(0.001, 2.0 / r["n"]),
        )
    if len(errs) != len(srows):
        return {
            "ok": False,
            "bound": "rank bound",
            "observed": f"{len(errs)} rank rows for {len(srows)} entries",
            "detail": "join lost rows",
        }
    worst_key = max(errs, key=lambda k: errs[k][0] / errs[k][1])
    worst = errs[worst_key][0] / errs[worst_key][1]
    return _ratio_record(
        worst, worst_key,
        "GK accuracy=10000: |rank-p| <= max(0.001, 2/n)", errs,
    )


@_witness(
    "event_users_hll_rollup",
    "exact per-type count(distinct user_id) + exact day counts",
)
def _hll_rollup(spark, sf_dir, srows, scols) -> dict:
    i = {c: j for j, c in enumerate(scols)}
    approx = {r[i["event_type"]]: r[i["n_users_est"]] for r in srows}
    days = {r[i["event_type"]]: r[i["n_day_sketches"]] for r in srows}
    e = load_table(spark, sf_dir, "events")
    ex = {
        r["event_type"]: (r["n"], r["nd"])
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.countDistinct(F.to_date("ts")).alias("nd"),
        )
        .collect()
    }
    # n_day_sketches is EXACT by construction — equality, no slack
    bad_days = {
        k for k in days if k not in ex or days[k] != ex[k][1]
    }
    if bad_days:
        return {
            "ok": False,
            "bound": "n_day_sketches exact",
            "observed": f"day counts diverge for {sorted(bad_days)[:3]}",
            "detail": "",
        }
    return _bounded_keyed(
        approx, {k: v[0] for k, v in ex.items()},
        lambda n: max(3, 0.1 * n),
        "DataSketches HLL lgK=12: |err| <= max(3, 0.1n)",
    )


@_witness(
    "events_rolling_7d_users_hll",
    "exact rolling 7-day distinct users (contribute-to-window form)",
)
def _rolling_7d(spark, sf_dir, srows, scols) -> dict:
    from datetime import date

    i = {c: j for j, c in enumerate(scols)}
    approx = {r[i["day"]]: r[i["n_users_7d_est"]] for r in srows}
    win_days = {r[i["day"]]: r[i["n_days_in_window"]] for r in srows}
    # Independent exact derivation — the registered exact sibling's
    # contribute-to-window decomposition, rebuilt here
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = pairs.select("day").distinct().withColumnRenamed("day", "wday")
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
    ).distinct()
    exact = {
        str(r["wday"]): r["n"]
        for r in contrib.join(F.broadcast(days), "wday")
        .groupBy("wday")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # n_days_in_window is EXACT — recompute from the day list itself
    all_days = sorted(date.fromisoformat(d) for d in approx)
    for d, n in win_days.items():
        dd = date.fromisoformat(d)
        want = sum(1 for o in all_days if 0 <= (dd - o).days <= 6)
        if n != want:
            return {
                "ok": False,
                "bound": "n_days_in_window exact",
                "observed": f"day {d}: got {n}, want {want}",
                "detail": "",
            }
    return _bounded_keyed(
        approx, exact, lambda n: max(3, 0.1 * n),
        "DataSketches HLL merged: |err| <= max(3, 0.1n)",
    )


@_witness(
    "event_type_user_overlap_hll",
    "exact pairwise user-set intersections",
)
def _overlap(spark, sf_dir, srows, scols) -> dict:
    i = {c: j for j, c in enumerate(scols)}
    e = load_table(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    exact_pairs = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    exact_sizes = {
        r["event_type"]: r["n"]
        for r in tu.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # exact intersection emits no row for empty overlaps; the entry
    # emits every pair — fill zeros
    # No negative-estimate check: the entry floors inclusion-exclusion
    # at 0 by construction (F.greatest(lit(0), ...)), so a negative
    # value is structurally impossible — a guard here would be dead
    # code no perturbation could exercise (review r14).
    approx = {}
    for r in srows:
        k = (r[i["type_a"]], r[i["type_b"]])
        approx[k] = r[i["n_overlap_est"]]
        exact_pairs.setdefault(k, 0)
    # per-type estimates ride the same record (bound as the rollup's)
    for r in srows:
        for side, col in (("type_a", "n_users_a_est"), ("type_b", "n_users_b_est")):
            t, est = r[i[side]], r[i[col]]
            n = exact_sizes[t]
            if abs(est - n) > max(3, 0.1 * n):
                return {
                    "ok": False,
                    "bound": "per-type |err| <= max(3, 0.1n)",
                    "observed": f"{t}: est {est} vs exact {n}",
                    "detail": "",
                }
    return _bounded_keyed(
        approx, exact_pairs, lambda n: max(5, 0.10 * n),
        "inclusion-exclusion HLL: |err| <= max(5, 0.1n)",
    )


@_witness(
    "streaming_sliding_users_approx",
    "batch exact per-window count(distinct) + exact event counts",
)
def _sliding_users(spark, sf_dir, srows, scols) -> dict:
    i = {c: j for j, c in enumerate(scols)}
    approx = {r[i["window_start_us"]]: r[i["n_users_approx"]] for r in srows}
    got_ev = {r[i["window_start_us"]]: r[i["n_events"]] for r in srows}
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
    exact_ev = {r["ws"]: r["n_events"] for r in exact_rows}
    # the drained n_events column is EXACT — equality, no slack
    if got_ev != exact_ev:
        diff = {
            k for k in set(got_ev) | set(exact_ev)
            if got_ev.get(k) != exact_ev.get(k)
        }
        return {
            "ok": False,
            "bound": "n_events exact",
            "observed": f"event counts diverge in {len(diff)} windows",
            "detail": repr(sorted(diff)[:3]),
        }
    return _bounded_keyed(
        approx, {r["ws"]: r["n_users"] for r in exact_rows},
        lambda n: max(3, 0.15 * n),
        "HLL++ streaming state: |err| <= max(3, 0.15n)",
    )
