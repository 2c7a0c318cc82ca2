from datetime import datetime

import pytest

from pipelines_rj_sms_spark.operators.analytics import attribution_credits


def _events(spark):
    T = datetime
    rows = [
        # user 1: view, click, then purchase -> linear 0.5/0.5
        (1, T(2024, 1, 1, 10), "view"),
        (1, T(2024, 1, 1, 11), "click"),
        (1, T(2024, 1, 1, 12), "purchase"),
        # user 2: click only, then purchase
        (2, T(2024, 1, 2, 9), "click"),
        (2, T(2024, 1, 2, 10), "purchase"),
        # user 3: touches AFTER conversion never count
        (3, T(2024, 1, 3, 10), "purchase"),
        (3, T(2024, 1, 3, 11), "view"),
        # user 4: two conversions, one touch before each
        (4, T(2024, 1, 4, 8), "view"),
        (4, T(2024, 1, 4, 9), "purchase"),
        (4, T(2024, 1, 4, 10), "click"),
        (4, T(2024, 1, 4, 11), "purchase"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def _credits(df, model, **kw):
    out = attribution_credits(df, "user_id", "ts", "event_type",
                              ["purchase"], ["view", "click"],
                              model=model, **kw)
    return {r["channel"]: r["credited"] for r in out.collect()}


def test_linear_attribution(spark):
    got = _credits(_events(spark), "linear")
    # u1: view .5 click .5; u2: click 1; u4 conv1: view 1,
    # u4 conv2: view .5 click .5
    assert got == pytest.approx({"view": 2.0, "click": 2.0})


def test_last_touch_attribution(spark):
    got = _credits(_events(spark), "last_touch")
    # u1 -> click, u2 -> click, u4 conv1 -> view, u4 conv2 -> click
    assert got == pytest.approx({"view": 1.0, "click": 3.0})


def test_first_touch_with_lookback(spark):
    # 90-minute lookback: u1's view (2h before) falls outside
    got = _credits(_events(spark), "first_touch", lookback_seconds=5400)
    # u1 -> click (only touch in window), u2 -> click,
    # u4 conv1 -> view, u4 conv2 -> click (view is 3h before)
    assert got == pytest.approx({"view": 1.0, "click": 3.0})


def test_credit_mass_equals_attributable_conversions(spark):
    df = _events(spark)
    for model in ("linear", "first_touch", "last_touch"):
        got = _credits(df, model)
        # u3's conversion has no prior touch -> 4 attributable
        assert sum(got.values()) == pytest.approx(4.0)


def test_position_model_u_shape(spark):
    """4 touches -> 0.4/0.1/0.1/0.4; 2 touches -> 0.5 each; 1 touch
    -> 1.0. Credits per conversion always sum to 1."""
    from pipelines_rj_sms_spark.operators.analytics import (
        attribution_credits)
    rows = [
        # user 1: four touches then purchase
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 12:00:00", "click"),
        (1, "2024-01-01 13:00:00", "signup"),
        (1, "2024-01-01 14:00:00", "purchase"),
        # user 2: two touches
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 11:00:00", "signup"),
        (2, "2024-01-01 12:00:00", "purchase"),
        # user 3: one touch
        (3, "2024-01-01 10:00:00", "click"),
        (3, "2024-01-01 11:00:00", "purchase"),
    ]
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, ["u", "ts", "e"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["channel"]: r for r in attribution_credits(
        df, "u", "ts", "e", conversion_events=["purchase"],
        touch_events=["view", "click", "signup"],
        model="position").collect()}
    # user1: view 0.4, click 0.1+0.1, signup 0.4
    # user2: view 0.5, signup 0.5 ; user3: click 1.0
    assert abs(out["view"]["credited"] - (0.4 + 0.5)) < 1e-6
    assert abs(out["click"]["credited"] - (0.2 + 1.0)) < 1e-6
    assert abs(out["signup"]["credited"] - (0.4 + 0.5)) < 1e-6
    total = sum(r["credited"] for r in out.values())
    assert abs(total - 3.0) < 1e-6
