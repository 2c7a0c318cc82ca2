from datetime import datetime

import pytest

from pipelines_rj_sms_spark.operators.timeseries import interpolate_linear


def _series(spark, vals, key=None):
    rows = []
    for h, v in enumerate(vals):
        r = (datetime(2024, 1, 1, h), v)
        rows.append(((key,) + r) if key else r)
    schema = ("k string, " if key else "") + "ts timestamp, v double"
    return spark.createDataFrame(rows, schema)


def test_interpolate_midpoint_and_uneven(spark):
    df = _series(spark, [10.0, None, None, 40.0])
    out = [r["v"] for r in interpolate_linear(
        df, "ts", "v").orderBy("ts").collect()]
    assert out == pytest.approx([10.0, 20.0, 30.0, 40.0])


def test_interpolate_edges_clamp(spark):
    df = _series(spark, [None, 5.0, None, 9.0, None])
    out = [r["v"] for r in interpolate_linear(
        df, "ts", "v").orderBy("ts").collect()]
    assert out == pytest.approx([5.0, 5.0, 7.0, 9.0, 9.0])


def test_interpolate_all_null_stays_null(spark):
    df = _series(spark, [None, None])
    out = [r["v"] for r in interpolate_linear(
        df, "ts", "v").orderBy("ts").collect()]
    assert out == [None, None]


def test_interpolate_keyed_and_out_col(spark):
    a = _series(spark, [0.0, None, 10.0], key="a")
    b = _series(spark, [100.0, None, 0.0], key="b")
    df = a.unionByName(b)
    out = interpolate_linear(df, "ts", "v", key_cols=["k"],
                             out_col="v_fill")
    got = {(r["k"], r["ts"].hour): (r["v"], r["v_fill"])
           for r in out.collect()}
    assert got[("a", 1)] == (None, pytest.approx(5.0))
    assert got[("b", 1)] == (None, pytest.approx(50.0))
    # observed rows pass through bit-identical
    assert got[("a", 0)] == (0.0, 0.0)
