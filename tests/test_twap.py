from datetime import datetime

import pytest

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.timeseries import time_weighted_avg


def test_twap_whole_series(spark):
    T = datetime
    # value 10 for 60s, then 20 for 30s, tail obs carries no weight
    rows = [("a", T(2024, 1, 1, 0, 0, 0), 10.0),
            ("a", T(2024, 1, 1, 0, 1, 0), 20.0),
            ("a", T(2024, 1, 1, 0, 1, 30), 99.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = time_weighted_avg(df, "ts", "v", key_cols=["k"]).collect()[0]
    assert out["twap"] == pytest.approx((10 * 60 + 20 * 30) / 90)
    assert out["n_obs"] == 3


def test_twap_bucket_clips_at_boundary(spark):
    T = datetime
    # obs at :30 of hour 0 (value 10) holds until hour end (30 min),
    # next obs at hour 1 :00 value 30 holds 60 min within hour 1...
    rows = [(T(2024, 1, 1, 0, 30), 10.0),
            (T(2024, 1, 1, 1, 0), 30.0),
            (T(2024, 1, 1, 2, 0), 50.0)]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = {r["bucket"].hour: r["twap"]
           for r in time_weighted_avg(df, "ts", "v",
                                      bucket="hour").collect()}
    assert out[0] == pytest.approx(10.0)
    assert out[1] == pytest.approx(30.0)
    # tail bucket: zero duration -> plain average fallback
    assert out[2] == pytest.approx(50.0)


def test_twap_single_observation_fallback(spark):
    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 42.0)], ["k", "ts", "v"])
    out = time_weighted_avg(df, "ts", "v", key_cols=["k"]).collect()[0]
    assert out["twap"] == 42.0


def test_twap_keys_partition_series(spark):
    T = datetime
    rows = [("a", T(2024, 1, 1, 0, 0), 10.0),
            ("a", T(2024, 1, 1, 0, 2), 0.0),
            ("b", T(2024, 1, 1, 0, 0), 100.0),
            ("b", T(2024, 1, 1, 0, 1), 100.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {r["k"]: r["twap"]
           for r in time_weighted_avg(df, "ts", "v",
                                      key_cols=["k"]).collect()}
    assert got["a"] == pytest.approx(10.0)
    assert got["b"] == pytest.approx(100.0)


def test_twap_carry_in_credits_spanned_buckets(spark):
    """True bucketed LOCF: an observation at 10:30 whose next
    observation is 13:00 credits buckets 10 (30 min), 11 and 12 (full
    hours, n_obs 0) — not just its own clipped bucket."""
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:30:00", 10.0),
         ("a", "2024-01-01 13:00:00", 20.0)],
        ["k", "ts", "v"]).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {str(r["bucket"]): (r["twap"], r["n_obs"])
           for r in time_weighted_avg(
               df, "ts", "v", key_cols=["k"], bucket="hour",
               carry_in=True).collect()}
    assert got == {
        "2024-01-01 10:00:00": (10.0, 1),
        "2024-01-01 11:00:00": (10.0, 0),
        "2024-01-01 12:00:00": (10.0, 0),
        "2024-01-01 13:00:00": (20.0, 1),   # tail: plain-value fallback
    }
    # clipped default: intervening buckets absent, weight clipped
    clip = {str(r["bucket"]): (r["twap"], r["n_obs"])
            for r in time_weighted_avg(
                df, "ts", "v", key_cols=["k"], bucket="hour").collect()}
    assert set(clip) == {"2024-01-01 10:00:00", "2024-01-01 13:00:00"}


def test_twap_carry_in_partial_bucket_mix(spark):
    """Mid-bucket transition: 10:00 v=0 -> 11:30 v=60 -> 12:00 end.
    Bucket 11 = half 0, half 60 -> 30; duplicate-timestamp guard."""
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 0.0),
         ("a", "2024-01-01 11:30:00", 60.0),
         ("a", "2024-01-01 11:30:00", 60.0),  # duplicate ts
         ("a", "2024-01-01 12:00:00", 0.0)],
        ["k", "ts", "v"]).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {str(r["bucket"]): r["twap"]
           for r in time_weighted_avg(
               df, "ts", "v", key_cols=["k"], bucket="hour",
               carry_in=True).collect()}
    assert got["2024-01-01 10:00:00"] == 0.0
    assert got["2024-01-01 11:00:00"] == 30.0
