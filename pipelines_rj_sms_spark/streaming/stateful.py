"""Custom stateful streaming operator — gap-based sessionization via
applyInPandasWithState (the "custom stateful operators" slot in the
engine's streaming facet; batch analog is the sessionize_events query).

The reference has no true streaming (SURVEY §1.1) — its 30-minute
monitors are cron'd batch. This operator is the additive scale path:
per-user session state is O(1) (start, last_ts, count), closed sessions
emit as soon as a gap larger than ``gap`` is observed, and idle users
are flushed by processing-time timeout, so state never grows with
history — the 100 TB-stream-safe design.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", DoubleType()),   # epoch seconds
    StructField("session_end", DoubleType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start", DoubleType()),
    StructField("last", DoubleType()),
    StructField("n", LongType()),
])


def sessionize(events: DataFrame, gap_s: float = 300.0,
               idle_timeout_ms: int = 60_000,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Emit (user_id, session_start, session_end, n_events) per closed
    session. ``events`` must be a *streaming* DataFrame."""

    def update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle user: flush the pending session and clear
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame([{"user_id": user_id, "session_start": start,
                                     "session_end": last, "n_events": n}])
            return

        ts_vals: list[float] = []
        for pdf in pdfs:
            ts_vals.extend(pdf[ts_col].map(lambda t: t.timestamp()).tolist())
        ts_vals.sort()

        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[dict] = []
        for t in ts_vals:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append({"user_id": user_id, "session_start": start,
                               "session_end": last, "n_events": n})
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update, SESSION_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
