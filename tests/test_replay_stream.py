"""Replay streaming source: paced batches, batch/stream parity, and
checkpoint-restart exactly-once."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.sources.pyds import (
    ReplayDataSource,
    _ReplayStreamReader,
)
from pipelines_rj_sms_spark.streaming.incremental import run_stream_once

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


def _drain(q):
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)


def test_replay_parity_and_pacing(spark, tmp_path):
    """The full events table arrives, in batches of rowsPerBatch, and
    aggregates over the stream equal the batch read exactly."""
    spark.dataSource.register(ReplayDataSource)
    path = os.path.join(SF_DIR, "events.parquet")
    stream = (spark.readStream.format("replay")
              .option("rowsPerBatch", 300).load(path))
    q = (stream.writeStream.format("memory").queryName("rp")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").start())
    _drain(q)

    from pipelines_rj_sms_spark.session import read_parquet_normalized
    batch = read_parquet_normalized(spark, path)
    got = spark.sql(
        "SELECT count(*) n, sum(value) s, count(distinct event_id) d "
        "FROM rp").collect()[0]
    want = batch.agg(
        F.count("*").alias("n"), F.sum("value").alias("s"),
        F.count_distinct("event_id").alias("d")).collect()[0]
    assert (got["n"], got["d"]) == (want["n"], want["d"])
    assert abs(got["s"] - want["s"]) < 1e-6
    # 1000 rows / 300 per batch -> at least 4 non-trivial microbatches
    n_batches = sum(1 for p in q.recentProgress
                    if p["numInputRows"] and p["numInputRows"] > 0)
    assert n_batches >= 4


def test_replay_restart_is_exactly_once(spark, tmp_path):
    """Re-starting a fully-drained query on the same checkpoint emits
    nothing new — offsets restore, no replay, no loss. (File sink: the
    memory sink does not support checkpoint recovery.)"""
    spark.dataSource.register(ReplayDataSource)
    path = os.path.join(SF_DIR, "events.parquet")
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def start():
        return (spark.readStream.format("replay")
                .option("rowsPerBatch", 400).load(path)
                .select("event_id")
                .writeStream.format("parquet")
                .option("checkpointLocation", ck).option("path", out)
                .outputMode("append").start())

    q1 = start()
    _drain(q1)
    n1 = spark.read.parquet(out).count()

    q2 = start()
    _drain(q2)
    n2 = spark.read.parquet(out).count()
    assert n1 == 1000
    assert n2 == n1  # nothing re-emitted after restart
    # and no duplicates anywhere across the whole run
    assert spark.read.parquet(out).distinct().count() == 1000


def test_row_group_pruned_slicing(tmp_path):
    """_rows(lo, hi) materializes only overlapping row groups and trims
    exactly to the offset range."""
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"i": pa.array(range(100), pa.int64())}),
        path, row_group_size=10)
    rdr = _ReplayStreamReader({"path": path})
    assert rdr._total == 100
    got = [r[0] for r in rdr._rows(37, 63)]
    assert got == list(range(37, 63))
    assert [r[0] for r in rdr._rows(0, 100)] == list(range(100))
    assert list(rdr._rows(100, 100)) == []


def test_replay_offsets_are_contiguous(tmp_path):
    """read() advances by rowsPerBatch and clamps at the end; replayed
    ranges return identical rows (the exactly-once recovery contract)."""
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"i": pa.array(range(50), pa.int64())}), path,
        row_group_size=7)
    rdr = _ReplayStreamReader({"path": path, "rowsperbatch": "20"})
    off = rdr.initialOffset()
    seen = []
    for _ in range(4):
        it, nxt = rdr.read(off)
        seen.extend(r[0] for r in it)
        if nxt == off:
            break
        # recovery replay of the same range must match
        assert [r[0] for r in rdr.readBetweenOffsets(off, nxt)] == \
            seen[off["row"]:nxt["row"]]
        off = nxt
    assert seen == list(range(50))
    assert off == {"row": 50}
