"""Seeded-random differential tests: Spark operators vs independent
pure-Python reference implementations on generated data.

The oracle SQL proves cross-engine agreement on the fixture corpus;
these prove agreement with a THIRD, loop-style implementation on
randomized inputs (seeded — failures reproduce), covering shapes the
fixtures may not contain (ties, bursts, empty groups, extreme values).
One Spark job per test: the whole random dataset goes through in a
single DataFrame, so hypothesis-style per-example jobs are avoided.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

SEED = 20260813


def test_funnel_matches_python_simulation(spark):
    from parallel_map_reduce_spark.operators.funnel import funnel_first_completion

    rng = random.Random(SEED)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    for i in range(3000):
        user = rng.randint(1, 60)  # dense users → plenty of ties/bursts
        ts_us = rng.randint(0, 500) * 1_000_000  # coarse → many equal ts
        rows.append((i, user, ts_us, rng.choice(types)))

    # pure-Python reference: sort by (ts, step_rank) per user, run the
    # state machine
    rank = {"view": 0, "click": 1, "purchase": 2}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for _eid, u, ts, et in rows:
        if et in rank:
            by_user.setdefault(u, []).append((ts, rank[et]))
    want = {}
    for u, evs in by_user.items():
        st = [None, None, None]
        for ts, rk in sorted(evs):
            if rk == 0 and st[0] is None:
                st[0] = ts
            elif rk == 1 and st[1] is None and st[0] is not None:
                st[1] = ts
            elif rk == 2 and st[2] is None and st[1] is not None:
                st[2] = ts
        if st[2] is not None:
            want[u] = tuple(st)

    df = spark.createDataFrame(
        [(e, u, ts, et) for e, u, ts, et in rows],
        "event_id LONG, user_id LONG, ts_us LONG, event_type STRING",
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    got = {
        r.user_id: (r.view_ts_us, r.click_ts_us, r.purchase_ts_us)
        for r in funnel_first_completion(df).collect()
    }
    assert got == want


def test_morton_matches_python_interleave(spark):
    from parallel_map_reduce_spark.operators.layout import morton_code

    rng = random.Random(SEED)
    pairs = [(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(500)]
    pairs += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2)]

    def py_morton(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "a LONG, b LONG")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", morton_code(F.col("a"), F.col("b"))).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == py_morton(a, b), (a, b)


def test_global_ntile_matches_python_on_random(spark):
    from parallel_map_reduce_spark.operators.ranking import global_ntile

    rng = random.Random(SEED)
    # heavy ties: values drawn from a tiny domain
    vals = [(i, rng.randint(0, 20)) for i in range(2000)]
    df = spark.createDataFrame(vals, "id LONG, v LONG")
    k = 7
    got = {r.id: r.t for r in global_ntile(df, ["v", "id"], k, out_col="t").collect()}

    order = sorted(vals, key=lambda x: (x[1], x[0]))
    n = len(order)
    q, r = divmod(n, k)
    want = {}
    pos = 0
    for tile in range(1, k + 1):
        size = q + (1 if tile <= r else 0)
        for _ in range(size):
            want[order[pos][0]] = tile
            pos += 1
    assert got == want
