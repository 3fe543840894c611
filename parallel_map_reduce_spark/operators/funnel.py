"""Ordered funnel analysis — "did the user do A, then B, then C?".

The classic formulation is a cascade of k-1 dependent joins (first A per
user; first B at-or-after it; first C at-or-after that), which costs k
shuffles and re-reads the fact table k times. Here the whole funnel is
ONE shuffle: events project to (user, ts_us, step_rank), group to a
per-user array, and an ``aggregate`` fold over the time-sorted array
advances the step state machine entirely inside codegen — the same
per-key sequential pass the reference's per-document word loop does
(``src/tema1.cpp:142-166``), generalized to ordered state.

Tie semantics: the sort key is (ts, step_rank), so a later step landing
on the SAME timestamp as the step before it still counts (>= matching,
the convention funnel products use and the oracle's join formulation
mirrors with ``e.ts >= prev.t``).

Scale: per-user state is the events of that user restricted to the
funnel's step types — bounded by user activity, not corpus size. A
pathological hot user (bot traffic) bounds at its own event count; cap
with a per-(user, day) pre-aggregation if that ever dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_first_completion(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """(user_id, <step>_ts_us per step): the earliest ordered completion
    of the funnel per user — for each step, the first event of that type
    at-or-after the previous step's matched event. Users who never reach
    the last step are dropped."""
    k = len(steps)
    rank = F.lit(None).cast("int")
    for i in range(k - 1, -1, -1):
        rank = F.when(F.col("event_type") == steps[i], F.lit(i)).otherwise(rank)
    slim = events.select(
        "user_id", F.unix_micros("ts").alias("us"), rank.alias("rank")
    ).filter(F.col("rank").isNotNull())
    seqs = slim.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "rank"))).alias("seq")
    )

    names = [f"s{i}" for i in range(k)]
    init = F.struct(*[F.lit(None).cast("bigint").alias(n) for n in names])

    def step_fold(acc, e):
        fields = []
        for i, n in enumerate(names):
            prev_ok = F.lit(True) if i == 0 else acc[names[i - 1]].isNotNull()
            fields.append(
                F.when(
                    prev_ok & acc[n].isNull() & (e["rank"] == i), e["us"]
                ).otherwise(acc[n]).alias(n)
            )
        return F.struct(*fields)

    done = seqs.select(
        "user_id", F.aggregate("seq", init, step_fold).alias("st")
    ).filter(F.col(f"st.{names[-1]}").isNotNull())
    return done.select(
        "user_id",
        *[F.col(f"st.{n}").alias(f"{s}_ts_us") for n, s in zip(names, steps)],
    )


def funnel_first_completion_capped(
    events: DataFrame,
    cap_us: int,
    steps: tuple[str, ...] = FUNNEL_STEPS,
) -> DataFrame:
    """``funnel_first_completion`` with a per-step conversion window:
    step i must occur within ``cap_us`` of step i-1's matched event
    (the "converted within N hours" semantics funnel products report).

    Matching stays GREEDY — each step matches its FIRST qualifying
    event; a step whose window lapses does not re-anchor on a later
    candidate. Greedy is what the k-join cascade formulation computes
    too, which is exactly what makes the independent oracle a semantic
    proof rather than a restatement. Same single-shuffle array-fold
    plan as the uncapped operator; the deadline is one more predicate
    inside the codegen'd state machine."""
    k = len(steps)
    rank = F.lit(None).cast("int")
    for i in range(k - 1, -1, -1):
        rank = F.when(F.col("event_type") == steps[i], F.lit(i)).otherwise(rank)
    slim = events.select(
        "user_id", F.unix_micros("ts").alias("us"), rank.alias("rank")
    ).filter(F.col("rank").isNotNull())
    seqs = slim.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "rank"))).alias("seq")
    )

    names = [f"s{i}" for i in range(k)]
    init = F.struct(*[F.lit(None).cast("bigint").alias(n) for n in names])

    def step_fold(acc, e):
        fields = []
        for i, n in enumerate(names):
            if i == 0:
                ok = F.lit(True)
            else:
                prev = acc[names[i - 1]]
                ok = prev.isNotNull() & (e["us"] - prev <= F.lit(cap_us))
            fields.append(
                F.when(
                    ok & acc[n].isNull() & (e["rank"] == i), e["us"]
                ).otherwise(acc[n]).alias(n)
            )
        return F.struct(*fields)

    done = seqs.select(
        "user_id", F.aggregate("seq", init, step_fold).alias("st")
    ).filter(F.col(f"st.{names[-1]}").isNotNull())
    return done.select(
        "user_id",
        *[F.col(f"st.{n}").alias(f"{s}_ts_us") for n, s in zip(names, steps)],
    )
