"""Streaming facet extras: bounded-state dedup, stream-static enrich,
stream-stream interval join (M8 surface beyond the monitor/upsert e2e)."""

import json

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.streaming.incremental import (
    run_stream_once, stream_dedup, stream_interval_join,
    stream_static_enrich)


def _write_json(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(r) for r in rows))


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    _write_json(src / "a.json", [
        {"k": 1, "ts": "2024-01-01 10:00:00", "v": "first"},
        {"k": 1, "ts": "2024-01-01 10:00:30", "v": "dupe-close"},
        {"k": 2, "ts": "2024-01-01 10:01:00", "v": "other"},
    ])
    stream = (spark.readStream.schema("k long, ts string, v string")
              .json(str(src))
              .withColumn("ts", F.col("ts").cast("timestamp")))
    deduped = stream_dedup(stream, ["k"], "ts", delay="10 minutes")
    q = (deduped.writeStream.format("memory").queryName("dd")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    run_stream_once(q)
    got = sorted((r.k, r.v) for r in spark.sql("SELECT * FROM dd").collect())
    # k=1 collapsed to its first-seen row, k=2 untouched
    assert got == [(1, "first"), (2, "other")]


def test_stream_static_enrich_broadcasts(spark, tmp_path):
    src = tmp_path / "src"
    _write_json(src / "a.json", [{"k": 1, "v": 10.0}, {"k": 3, "v": 30.0}])
    dim = spark.createDataFrame([(1, "um"), (2, "dois")], ["k", "nome"])
    stream = spark.readStream.schema("k long, v double").json(str(src))
    enriched = stream_static_enrich(stream, dim, "k")
    q = (enriched.writeStream.format("memory").queryName("en")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    run_stream_once(q)
    got = sorted((r.k, r.nome) for r in spark.sql("SELECT * FROM en").collect())
    assert got == [(1, "um"), (3, None)]


def test_stream_interval_join_bounds_matches(spark, tmp_path):
    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    _write_json(lsrc / "a.json", [
        {"k": 1, "signup_ts": "2024-01-01 10:00:00"},
        {"k": 2, "signup_ts": "2024-01-01 12:00:00"},
    ])
    _write_json(rsrc / "a.json", [
        {"k": 1, "purchase_ts": "2024-01-01 10:05:00"},   # in window
        {"k": 1, "purchase_ts": "2024-01-01 11:00:00"},   # past upper bound
        {"k": 2, "purchase_ts": "2024-01-01 11:59:00"},   # before signup
    ])
    left = (spark.readStream.schema("k long, signup_ts string").json(str(lsrc))
            .withColumn("signup_ts", F.col("signup_ts").cast("timestamp")))
    right = (spark.readStream.schema("k long, purchase_ts string")
             .json(str(rsrc))
             .withColumn("purchase_ts", F.col("purchase_ts").cast("timestamp")))
    joined = stream_interval_join(
        left, right, key="k", left_ts="signup_ts", right_ts="purchase_ts",
        lower="0 seconds", upper="15 minutes",
    )
    q = (joined.writeStream.format("memory").queryName("ij")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    run_stream_once(q)
    rows = spark.sql("SELECT * FROM ij").collect()
    assert len(rows) == 1
    assert rows[0]["purchase_ts"].minute == 5


def test_stream_scd2_end_to_end(spark, tmp_path):
    """Two paced microbatches of keyed observations maintain an SCD2
    history equal to compressing the whole log at once; a replayed
    batch id is skipped (marker idempotence)."""
    import json

    from pipelines_rj_sms_spark.operators.scd import compress_history
    from pipelines_rj_sms_spark.streaming.incremental import (
        run_stream_once, stream_scd2)

    rows1 = [
        {"k": 1, "ts": "2024-01-01T00:00:00", "state": "A", "oid": 1},
        {"k": 1, "ts": "2024-01-01T01:00:00", "state": "A", "oid": 2},
        {"k": 2, "ts": "2024-01-01T00:30:00", "state": "X", "oid": 3},
    ]
    rows2 = [
        {"k": 1, "ts": "2024-01-01T02:00:00", "state": "B", "oid": 4},
        {"k": 3, "ts": "2024-01-01T03:00:00", "state": "C", "oid": 5},
    ]
    src = tmp_path / "scdsrc"
    src.mkdir()
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows1))
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows2))

    schema = "k long, ts timestamp, state string, oid long"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    hist_path = str(tmp_path / "hist")
    q = stream_scd2(stream, hist_path, str(tmp_path / "ck"),
                    "k", "ts", "state", "oid", n_buckets=8)
    run_stream_once(q)

    got = {(r["k"], r["state"], r["valid_from"], r["valid_to"], r["n_obs"])
           for r in spark.read.parquet(hist_path).drop("_kb").collect()}
    full = spark.createDataFrame(
        [(r["k"], r["ts"].replace("T", " "), r["state"], r["oid"])
         for r in rows1 + rows2], "k long, ts string, state string, oid long"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "state", "oid")
    want = {(r["k"], r["state"], r["valid_from"], r["valid_to"], r["n_obs"])
            for r in compress_history(full, "k", "ts", "state",
                                      "oid").collect()}
    assert got == want

    # replay on the SAME checkpoint path with its state wiped (lost
    # checkpoint, batch ids restart at 0): the (checkpoint, batch_id)
    # markers recognize the replayed ids and must NOT double-merge
    import shutil
    shutil.rmtree(str(tmp_path / "ck"))
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).json(str(src)))
    q2 = stream_scd2(stream2, hist_path, str(tmp_path / "ck"),
                     "k", "ts", "state", "oid", n_buckets=8)
    run_stream_once(q2)
    again = {(r["k"], r["state"], r["valid_from"], r["valid_to"], r["n_obs"])
             for r in spark.read.parquet(hist_path).drop("_kb").collect()}
    assert again == want


def test_stream_expectations_gate_e2e(spark, tmp_path):
    from pipelines_rj_sms_spark.quality.expectations import (
        between, not_null)
    from pipelines_rj_sms_spark.streaming.incremental import (
        stream_expectations)
    src = tmp_path / "src"
    _write_json(src / "a.json", [
        {"k": 1, "v": 10.0}, {"k": 2, "v": 999.0},
        {"k": 3, "v": None}, {"k": 4, "v": 50.0},
    ])
    stream = spark.readStream.schema("k long, v double").json(str(src))
    suite = [not_null("v", tolerance=0.5),
             between("v", 0.0, 100.0, tolerance=0.0)]
    q = stream_expectations(
        stream, suite,
        report_path=str(tmp_path / "report"),
        checkpoint_path=str(tmp_path / "ck"),
        quarantine_path=str(tmp_path / "bad"))
    run_stream_once(q)
    rep = {r["expectation"]: r.asDict()
           for r in spark.read.parquet(str(tmp_path / "report")).collect()}
    assert rep["v_not_null"]["n_violations"] == 1
    assert rep["v_not_null"]["passed"]
    assert rep["v_between"]["n_violations"] == 1
    assert not rep["v_between"]["passed"]
    bad = {r["k"] for r in spark.read.parquet(
        str(tmp_path / "bad")).collect()}
    # null v violates not_null; 999 violates between
    assert bad == {2, 3}


def test_stream_sketch_rollup_merges_batches(spark, tmp_path):
    from pipelines_rj_sms_spark.operators.sketches import merge_rollup
    from pipelines_rj_sms_spark.streaming.incremental import (
        stream_sketch_rollup)
    src = tmp_path / "src"
    # batch files land separately -> separate micro-batches under
    # maxFilesPerTrigger
    _write_json(src / "a.json", [
        {"d": "2024-01-01", "g": "x", "u": i} for i in range(50)])
    _write_json(src / "b.json", [
        {"d": "2024-01-01", "g": "x", "u": i} for i in range(25, 75)
    ] + [{"d": "2024-01-02", "g": "x", "u": 1}])
    stream = (spark.readStream.schema("d string, g string, u long")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = stream_sketch_rollup(
        stream, rollup_path=str(tmp_path / "rollup"),
        checkpoint_path=str(tmp_path / "ck"),
        group_cols=["g"], value_col="u", date_col="d")
    run_stream_once(q)
    rollup = spark.read.parquet(str(tmp_path / "rollup"))
    est = {(str(r["d"]), r["g"]): r["distinct_estimate"]
           for r in merge_rollup(rollup, ["d", "g"]).collect()}
    assert est, "rollup table empty"
    # day 1 saw 0..74 distinct across two merged batches
    assert abs(est[("2024-01-01", "x")] - 75) <= 3
    assert est[("2024-01-02", "x")] == 1
    # coarser grain over the same table
    total = merge_rollup(rollup, ["g"]).collect()[0]["distinct_estimate"]
    assert abs(total - 75) <= 3


def test_stream_additive_rollup_exact_and_replay_safe(spark, tmp_path):
    from pipelines_rj_sms_spark.streaming.incremental import (
        stream_additive_rollup)
    src = tmp_path / "src"
    _write_json(src / "a.json", [
        {"d": "2024-01-01", "g": "x", "v": 10.0},
        {"d": "2024-01-01", "g": "x", "v": 5.0}])
    _write_json(src / "b.json", [
        {"d": "2024-01-01", "g": "x", "v": 1.0},
        {"d": "2024-01-02", "g": "y", "v": 2.0}])
    stream = (spark.readStream.schema("d string, g string, v double")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = stream_additive_rollup(
        stream, rollup_path=str(tmp_path / "roll"),
        checkpoint_path=str(tmp_path / "ck"),
        group_cols=["g"], date_col="d", sum_cols=["v"])
    run_stream_once(q)
    got = {(str(r["d"]), r["g"]): (r["row_count"], r["sum_v"])
           for r in spark.read.parquet(str(tmp_path / "roll")).collect()}
    assert got[("2024-01-01", "x")] == (3, 16.0)
    assert got[("2024-01-02", "y")] == (1, 2.0)
    # replay on the same checkpoint path with its state wiped: batch
    # ids restart at 0, (checkpoint, batch_id) markers skip both
    # batches, totals stay exact
    import shutil
    shutil.rmtree(str(tmp_path / "ck"))
    stream2 = (spark.readStream.schema("d string, g string, v double")
               .option("maxFilesPerTrigger", 1).json(str(src)))
    q2 = stream_additive_rollup(
        stream2, rollup_path=str(tmp_path / "roll"),
        checkpoint_path=str(tmp_path / "ck"),
        group_cols=["g"], date_col="d", sum_cols=["v"])
    run_stream_once(q2)
    again = {(str(r["d"]), r["g"]): (r["row_count"], r["sum_v"])
             for r in spark.read.parquet(str(tmp_path / "roll")).collect()}
    assert again == got


def test_stream_quantile_rollup_cross_batch_percentiles(spark, tmp_path):
    from pipelines_rj_sms_spark.operators.sketches import (
        merge_quantile_rollup)
    from pipelines_rj_sms_spark.streaming.incremental import (
        stream_quantile_rollup)
    src = tmp_path / "src"
    _write_json(src / "a.json", [
        {"d": "2024-01-01", "g": "x", "v": float(i)} for i in range(100)])
    _write_json(src / "b.json", [
        {"d": "2024-01-01", "g": "x", "v": float(i)}
        for i in range(100, 200)])
    stream = (spark.readStream.schema("d string, g string, v double")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = stream_quantile_rollup(
        stream, rollup_path=str(tmp_path / "roll"),
        checkpoint_path=str(tmp_path / "ck"),
        group_cols=["g"], value_col="v", date_col="d")
    run_stream_once(q)
    rollup = spark.read.parquet(str(tmp_path / "roll"))
    row = merge_quantile_rollup(rollup, ["g"]).collect()[0]
    # 0..199 across two merged batches: p50 ~ 100, p90 ~ 180
    assert abs(row["q_50"] - 100) <= 6
    assert abs(row["q_90"] - 180) <= 6
    assert row["row_count"] == 200


def test_rollup_overwrite_scoped_on_static_session(spark, tmp_path):
    """Regression: on a session WITHOUT the dynamic-overwrite default,
    a micro-batch touching only day 2 must not delete day 1's rollup
    partition (the writers set partitionOverwriteMode explicitly)."""
    from pipelines_rj_sms_spark.streaming.incremental import (
        stream_additive_rollup)
    src1 = tmp_path / "src1"
    src2 = tmp_path / "src2"
    _write_json(src1 / "a.json", [{"d": "2024-01-01", "g": "x", "v": 1.0}])
    _write_json(src2 / "b.json", [{"d": "2024-01-02", "g": "y", "v": 2.0}])
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        for i, src in enumerate((src1, src2)):
            stream = (spark.readStream
                      .schema("d string, g string, v double")
                      .json(str(src)))
            q = stream_additive_rollup(
                stream, rollup_path=str(tmp_path / "roll"),
                checkpoint_path=str(tmp_path / f"ck{i}"),
                group_cols=["g"], date_col="d", sum_cols=["v"])
            run_stream_once(q)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = {(str(r["d"]), r["g"]): (r["row_count"], r["sum_v"])
           for r in spark.read.parquet(str(tmp_path / "roll")).collect()}
    # day 1 survives the day-2-only batch under static session default
    assert got == {("2024-01-01", "x"): (1, 1.0),
                   ("2024-01-02", "y"): (1, 2.0)}
