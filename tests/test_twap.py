from datetime import datetime

import pytest

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
