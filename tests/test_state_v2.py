"""Running monitor: state carries across microbatches, update-mode emits
refreshed totals, final state equals the batch aggregate.

Two interchangeable engines, same semantics:
- transformWithState (RocksDB ValueState) — needs protobuf on workers;
- foreachBatch + versioned-parquet state — runs everywhere.

Where protobuf is present both paths run; where it is absent the
fallback still asserts the BEHAVIOR (not just plan construction), so
the stateful-monitor surface has an executed e2e in every environment.
"""

import json

import pytest

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.streaming.incremental import run_stream_once
from pipelines_rj_sms_spark.streaming.state_v2 import (
    protobuf_available,
    running_monitor,
    running_monitor_foreach_batch,
    use_rocksdb_state_store,
)

requires_protobuf = pytest.mark.skipif(
    not protobuf_available(),
    reason="transformWithState's Python state protocol needs protobuf; "
           "the foreachBatch-fallback tests below cover the behavior")


def _write_json(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(r) for r in rows))


def _two_batch_source(tmp_path):
    src = tmp_path / "src"
    _write_json(src / "a.json", [
        {"event_type": "login", "v": 1.0, "ts": "2024-01-01 10:00:00"},
        {"event_type": "login", "v": 2.0, "ts": "2024-01-01 10:01:00"},
        {"event_type": "click", "v": 5.0, "ts": "2024-01-01 10:02:00"},
    ])
    _write_json(src / "b.json", [
        {"event_type": "login", "v": 4.0, "ts": "2024-01-01 11:00:00"},
    ])
    return src


def test_running_monitor_plan_constructs(spark, tmp_path):
    """The operator builds a valid streaming plan without starting the
    query (no protobuf needed until the state server boots)."""
    src = tmp_path / "src"
    _write_json(src / "a.json",
                [{"event_type": "x", "v": 1.0, "ts": "2024-01-01 10:00:00"}])
    stream = (
        spark.readStream.schema("event_type string, v double, ts string")
        .json(str(src)).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = running_monitor(stream, "event_type", "v", "ts", ttl_ms=60_000)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "key", "n_events", "total_value", "last_ts_micros"]


def _assert_two_batch_semantics(rows):
    latest = {}
    for r in sorted(rows, key=lambda r: r["n_events"]):
        latest[r["key"]] = r
    assert latest["click"]["n_events"] == 1
    assert latest["click"]["total_value"] == 5.0
    # state carried: 2 events from batch 1 + 1 from batch 2
    assert latest["login"]["n_events"] == 3
    assert latest["login"]["total_value"] == 7.0
    # last-seen advanced to the batch-2 event time
    assert latest["login"]["last_ts_micros"] > latest["click"]["last_ts_micros"]
    # update-mode across >=2 batches: login was emitted more than once
    assert sum(1 for r in rows if r["key"] == "login") >= 2


def test_foreach_batch_monitor_across_batches(spark, tmp_path):
    """Fallback engine, two microbatches: identical update-mode
    semantics to the transformWithState path."""
    src = _two_batch_source(tmp_path)
    stream = (
        spark.readStream.schema("event_type string, v double, ts string")
        .option("maxFilesPerTrigger", 1).json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = running_monitor_foreach_batch(
        stream, "event_type", "v", "ts",
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"))
    run_stream_once(q)
    rows = [r.asDict() for r in
            spark.read.parquet(str(tmp_path / "out")).collect()]
    _assert_two_batch_semantics(rows)


def test_foreach_batch_monitor_matches_batch_aggregate(spark, tmp_path):
    """Replaying a slice of the real events table through the fallback
    stream gives exactly the batch groupBy totals."""
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    from pipelines_rj_sms_spark.session import read_parquet_normalized
    ev = read_parquet_normalized(spark, os.path.join(sf, "events.parquet"))
    src = str(tmp_path / "ev_parquet")
    ev.select("event_type", F.col("value").alias("v"), "ts").write.parquet(src)

    stream = spark.readStream.schema(
        "event_type string, v double, ts timestamp").parquet(src)
    q = running_monitor_foreach_batch(
        stream, "event_type", "v", "ts",
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"))
    run_stream_once(q)
    from pyspark.sql import Window
    w = Window.partitionBy("key").orderBy(F.col("n_events").desc())
    final = (spark.read.parquet(str(tmp_path / "out"))
             .withColumn("_rn", F.row_number().over(w))
             .filter("_rn = 1"))
    got = {r["key"]: (r["n_events"], round(r["total_value"], 6))
           for r in final.collect()}
    want = {r["event_type"]: (r["n"], round(r["s"], 6))
            for r in ev.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()}
    assert got == want


@requires_protobuf
def test_running_monitor_across_batches(spark, tmp_path):
    src = _two_batch_source(tmp_path)
    use_rocksdb_state_store(spark)
    stream = (
        spark.readStream.schema("event_type string, v double, ts string")
        .option("maxFilesPerTrigger", 1).json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = running_monitor(stream, "event_type", "v", "ts")
    q = (out.writeStream.format("memory").queryName("mon")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("update").trigger(availableNow=True).start())
    run_stream_once(q)
    rows = [r.asDict() for r in spark.sql("SELECT * FROM mon").collect()]
    _assert_two_batch_semantics(rows)


@requires_protobuf
def test_running_monitor_matches_batch_aggregate(spark, tmp_path):
    """Replaying a slice of the real events table through the stream
    gives exactly the batch groupBy totals — the incremental monitor is
    a drop-in for the reference's cron'd re-aggregation."""
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    from pipelines_rj_sms_spark.session import read_parquet_normalized
    ev = read_parquet_normalized(spark, os.path.join(sf, "events.parquet"))
    src = str(tmp_path / "ev_parquet")
    ev.select("event_type", F.col("value").alias("v"), "ts").write.parquet(src)

    use_rocksdb_state_store(spark)
    stream = spark.readStream.schema(
        "event_type string, v double, ts timestamp").parquet(src)
    out = running_monitor(stream, "event_type", "v", "ts")
    q = (out.writeStream.format("memory").queryName("mon2")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .outputMode("update").trigger(availableNow=True).start())
    run_stream_once(q)
    got = {r["key"]: (r["n_events"], round(r["total_value"], 6))
           for r in spark.sql(
               "SELECT * FROM mon2 QUALIFY row_number() OVER "
               "(PARTITION BY key ORDER BY n_events DESC) = 1").collect()}
    want = {r["event_type"]: (r["n"], round(r["s"], 6))
            for r in ev.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()}
    assert got == want
