"""Arbitrary stateful streaming on the Spark 4 transformWithState API.

The reference's monitors (30-minute cron'd batch re-aggregations, e.g.
its daily-report counts) re-scan the slice every run. The incremental
form keeps O(1) running state per key and emits refreshed totals only
for keys that saw new data — the shape that survives an unbounded
stream. applyInPandasWithState (streaming/stateful.py) already covers
gap sessionization; this module uses the newer transformWithState
processor API (Spark 4), which adds:

- typed, named state variables (ValueState) in the RocksDB state store
  rather than one opaque tuple;
- native state TTL: a key idle past the TTL is evicted by the store
  itself — bounded state with zero user bookkeeping (the 100 TB-stream
  guard: abandoned keys cannot accumulate forever);
- the same processor runs under batch `groupBy().transformWithState...`
  semantics for backfills.

State per key is three scalars (count, sum, last event-time micros):
fixed-size regardless of history length. Output is Update-mode — one
refreshed row per touched key per microbatch.

Runtime requirement (environment-gated, like the openpyxl XLSX path):
transformWithState's Python worker talks to the JVM state server over
protobuf, so the `protobuf` package must be importable on executors;
this container ships without it, so the e2e tests skip here and the
exercised custom-stateful path is applyInPandasWithState
(streaming/stateful.py). The RocksDB provider jar itself is bundled
with Spark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MONITOR_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("last_ts_micros", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("last_micros", LongType()),
])

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class RunningMonitorProcessor(StatefulProcessor):
    """Per-key running (count, sum, last-seen): the incremental monitor."""

    def __init__(self, value_col: str, ts_col: str,
                 ttl_ms: int | None = None) -> None:
        self._value_col = value_col
        self._ts_col = ts_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "running", _STATE_SCHEMA, ttl_duration_ms=self._ttl_ms)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timer_values) -> Iterator[pd.DataFrame]:
        n, total, last = (self._state.get() if self._state.exists()
                          else (0, 0.0, 0))
        for pdf in rows:
            n += int(len(pdf))
            total += float(pdf[self._value_col].sum())
            if len(pdf):
                ts = pd.to_datetime(pdf[self._ts_col])
                last = max(last, int(ts.astype("int64").max() // 1000))
        self._state.update((n, total, last))
        yield pd.DataFrame([{
            "key": key[0],
            "n_events": n,
            "total_value": total,
            "last_ts_micros": last,
        }])

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def use_rocksdb_state_store(spark) -> None:
    """transformWithState requires the RocksDB provider (bundled jar);
    runtime-settable, read at query start."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)


def running_monitor(events: DataFrame, key_col: str, value_col: str,
                    ts_col: str, ttl_ms: int | None = None) -> DataFrame:
    """Update-mode stream of refreshed per-key totals.

    ``events`` must be a streaming DataFrame; call
    :func:`use_rocksdb_state_store` on the session first. ``ttl_ms``
    bounds state for abandoned keys (store-side eviction).
    """
    return (
        events.groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=RunningMonitorProcessor(
                value_col, ts_col, ttl_ms=ttl_ms),
            outputStructType=MONITOR_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
