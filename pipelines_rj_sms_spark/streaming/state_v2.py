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


def protobuf_available() -> bool:
    """transformWithState's Python worker speaks protobuf to the JVM
    state server; absent the package, use the foreachBatch fallback."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def running_monitor_foreach_batch(events: DataFrame, key_col: str,
                                  value_col: str, ts_col: str,
                                  state_dir: str, out_dir: str,
                                  checkpoint_dir: str,
                                  keep_versions: int = 3):
    """foreachBatch fallback for :func:`running_monitor` — identical
    update-mode semantics (one refreshed row per touched key per
    microbatch) with state in versioned parquet instead of the
    RocksDB store, so it runs where protobuf is unavailable.

    Scale shape: per microbatch, ONE hash aggregation collapses the
    batch to its touched keys, a full-outer merge against the prior
    state snapshot combines running totals (key-partitioned join —
    state never funnels through the driver), and the merged snapshot
    is written to ``state_dir/v{batch_id}`` (versioned, so readers of
    the prior snapshot are never overwritten mid-read; the last
    ``keep_versions`` are retained). Touched-key refreshed rows append
    to ``out_dir``. State size is O(distinct keys) — the same bound
    the ValueState store gives, minus TTL eviction (add a WHERE on
    last_ts_micros at read time for that).

    Returns the started StreamingQuery.
    """
    import glob
    import shutil

    spark = events.sparkSession

    def _latest_state():
        versions = sorted(glob.glob(f"{state_dir}/v*"),
                          key=lambda p: int(p.rsplit("v", 1)[1]))
        return versions[-1] if versions else None

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        agg = (batch_df.groupBy(F.col(key_col).alias("key"))
               .agg(F.count("*").alias("_bn"),
                    F.sum(value_col).cast("double").alias("_bt"),
                    F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                    .cast("long").alias("_bl")))
        prior_path = _latest_state()
        if prior_path:
            prior = spark.read.parquet(prior_path)
        else:
            prior = spark.createDataFrame([], MONITOR_SCHEMA)
        merged = (prior.join(agg, "key", "full_outer")
                  .select(
                      "key",
                      (F.coalesce("n_events", F.lit(0))
                       + F.coalesce("_bn", F.lit(0))).alias("n_events"),
                      (F.coalesce("total_value", F.lit(0.0))
                       + F.coalesce("_bt", F.lit(0.0)))
                      .alias("total_value"),
                      F.greatest(
                          F.coalesce("last_ts_micros", F.lit(0)),
                          F.coalesce("_bl", F.lit(0)))
                      .alias("last_ts_micros")))
        merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")
        # update-mode emission: refreshed rows for TOUCHED keys only
        touched = (spark.read.parquet(f"{state_dir}/v{batch_id}")
                   .join(agg.select("key"), "key", "semi"))
        touched.write.mode("append").parquet(out_dir)
        # bounded retention
        versions = sorted(glob.glob(f"{state_dir}/v*"),
                          key=lambda p: int(p.rsplit("v", 1)[1]))
        for old in versions[:-keep_versions]:
            shutil.rmtree(old, ignore_errors=True)

    return (events.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
