from datetime import datetime

import pytest

from pipelines_rj_sms_spark.operators.analytics import ewma_smooth


def _series(spark, vals):
    rows = [(datetime(2024, 1, 1 + i), v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "ts timestamp, v double")


def test_ewma_hand_computed(spark):
    vals = [10.0, 20.0, 30.0]
    out = [r["ewma"] for r in ewma_smooth(
        _series(spark, vals), "ts", "v",
        alpha=0.5, lookback=4).orderBy("ts").collect()]
    # row0: 10; row1: (20 + .5*10)/1.5; row2: (30 + .5*20 + .25*10)/1.75
    assert out[0] == pytest.approx(10.0)
    assert out[1] == pytest.approx(25 / 1.5, abs=1e-6)
    assert out[2] == pytest.approx(42.5 / 1.75, abs=1e-6)


def test_ewma_interior_null_skipped(spark):
    vals = [10.0, None, 30.0]
    out = [r["ewma"] for r in ewma_smooth(
        _series(spark, vals), "ts", "v",
        alpha=0.5, lookback=4).orderBy("ts").collect()]
    assert out[1] is None                      # null observation
    # row2 skips the null: (30 + 0.25*10) / 1.25
    assert out[2] == pytest.approx(32.5 / 1.25, abs=1e-6)


def test_ewma_lookback_truncates(spark):
    vals = [100.0] + [1.0] * 5
    out = [r["ewma"] for r in ewma_smooth(
        _series(spark, vals), "ts", "v",
        alpha=0.5, lookback=2).orderBy("ts").collect()]
    # last row sees only rows 3..5 (all 1.0) -> exactly 1.0
    assert out[-1] == pytest.approx(1.0)
