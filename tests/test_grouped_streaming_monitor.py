"""Tests: per-group applyInPandas transforms + streaming windowed monitor
end-to-end (file stream, watermark, AvailableNow)."""

import json

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.grouped import (
    clip_quantiles_per_group,
    normalize_per_group,
)
from pipelines_rj_sms_spark.streaming.incremental import windowed_monitor


def test_normalize_per_group(spark):
    rows = [("a", float(v)) for v in range(1, 12)] + [("b", 100.0), ("b", 100.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {(r["grp"], r["value"]): r["value_norm"]
           for r in normalize_per_group(df, ["grp"], "value").collect()}
    # group a: median 6, IQR q75-q25 of 1..11 = 8.5-3.5 = 5 -> value 6 -> 0
    assert out[("a", 6.0)] == 0.0
    assert out[("a", 11.0)] == 1.0
    # constant group -> 0, not NaN/inf
    assert out[("b", 100.0)] == 0.0


def test_clip_quantiles_per_group(spark):
    rows = [("a", float(v)) for v in range(100)] + [("a", 1e9)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = clip_quantiles_per_group(df, ["grp"], "value", 0.01, 0.99)
    mx = out.agg(F.max("value_clipped")).first()[0]
    assert mx < 1e6  # outlier winsorized
    n = out.count()
    assert n == 101  # row count preserved


def test_windowed_monitor_streaming_e2e(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"user_id": 1, "event_type": "click", "ts": "2024-01-01 00:05:00"},
        {"user_id": 2, "event_type": "click", "ts": "2024-01-01 00:10:00"},
        {"user_id": 1, "event_type": "view", "ts": "2024-01-01 00:40:00"},
        {"user_id": 1, "event_type": "click", "ts": "2024-01-01 01:20:00"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts string")
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = windowed_monitor(stream, window_duration="30 minutes",
                           watermark="10 minutes")
    out_dir = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    rows_out = {(str(r["window_start"]), r["event_type"]): (r["qtd"], r["usuarios"])
                for r in got.collect()}
    # windows closed by the watermark (all but the 01:00-01:30 one, which
    # stays open in state): 00:00 click x2 (2 users), 00:30 view x1
    assert rows_out[("2024-01-01 00:00:00", "click")] == (2, 2)
    assert rows_out[("2024-01-01 00:30:00", "view")] == (1, 1)


def test_stream_upsert_sqlite(spark, tmp_path):
    import sqlite3

    from pipelines_rj_sms_spark.streaming.incremental import stream_upsert

    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT, ts TEXT)")

    src = tmp_path / "src"
    src.mkdir()
    # duplicate key 1 within the batch: keep-last (ts order) must win
    rows = [
        {"k": 1, "v": "old", "ts": "2024-01-01 00:00:00"},
        {"k": 1, "v": "new", "ts": "2024-01-01 01:00:00"},
        {"k": 2, "v": "b", "ts": "2024-01-01 00:30:00"},
    ]
    import json as _json
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows))

    stream = spark.readStream.schema("k long, v string, ts string").json(str(src))
    q = stream_upsert(stream, "t", ["k"], "ts",
                      lambda: sqlite3.connect(db), str(tmp_path / "chk"),
                      dialect="sqlite")
    q.awaitTermination(120)

    got = dict(sqlite3.connect(db).execute("SELECT k, v FROM t").fetchall())
    assert got == {1: "new", 2: "b"}
