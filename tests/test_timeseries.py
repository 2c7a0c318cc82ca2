"""Tests: as-of join + bucketed range join vs naive non-equi spellings."""

from datetime import datetime

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.timeseries import (
    asof_join,
    range_join_bucketed,
)


def _trades(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), "t1"),
        (1, datetime(2024, 1, 1, 10, 5, 0), "t2"),
        (2, datetime(2024, 1, 1, 9, 0, 0), "t3"),   # before any quote
        (3, datetime(2024, 1, 1, 12, 0, 0), "t4"),  # key with no quotes
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, trade string")


def _quotes(spark):
    rows = [
        (1, datetime(2024, 1, 1, 9, 59, 0), 100.0),
        (1, datetime(2024, 1, 1, 10, 0, 0), 101.0),   # tie with t1's ts
        (1, datetime(2024, 1, 1, 10, 4, 0), 102.0),
        (2, datetime(2024, 1, 1, 9, 30, 0), 200.0),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, px double")


def test_asof_backward(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="k",
                    right_prefix="q_")
    got = {r["trade"]: (r["q_px"], r["q_ts"]) for r in out.collect()}
    assert got["t1"][0] == 101.0          # inclusive: equal ts matches
    assert got["t2"][0] == 102.0          # latest prior quote
    assert got["t3"] == (None, None)      # trade precedes all quotes
    assert got["t4"] == (None, None)      # key absent on right
    assert out.count() == 4               # left-outer: every trade kept


def test_asof_forward_and_tolerance(spark):
    fwd = asof_join(_trades(spark), _quotes(spark), on="k",
                    direction="forward", right_prefix="q_")
    got = {r["trade"]: r["q_px"] for r in fwd.collect()}
    assert got["t1"] == 101.0             # equal ts, inclusive
    assert got["t2"] is None              # no later quote for k=1
    assert got["t3"] == 200.0             # next quote after 9:00

    tol = asof_join(_trades(spark), _quotes(spark), on="k",
                    tolerance_seconds=30, right_prefix="q_")
    got = {r["trade"]: r["q_px"] for r in tol.collect()}
    assert got["t1"] == 101.0             # gap 0s <= 30s
    assert got["t2"] is None              # gap 60s voided


def test_asof_matches_naive_on_events(spark):
    from pipelines_rj_sms_spark.session import read_parquet_normalized

    ev = read_parquet_normalized(spark, "/root/testdata/sf0.001/events.parquet")
    purch = ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id")
    login = ev.filter("event_type = 'login'") \
              .select("user_id", "ts", F.col("event_id").alias("login_id"))
    # events data has no 'login' type — use 'signup' instead
    login = ev.filter("event_type = 'signup'") \
              .select("user_id", "ts", F.col("event_id").alias("login_id"))

    out = asof_join(purch, login, on="user_id", right_prefix="m_")
    # naive: non-equi join + max-ts-per-left-row (small data only)
    naive = (
        purch.alias("p")
        .join(login.alias("l"),
              (F.col("p.user_id") == F.col("l.user_id")) &
              (F.col("p.ts") >= F.col("l.ts")), "left")
        .groupBy("p.event_id")
        .agg(F.max_by(F.col("l.login_id"), F.col("l.ts")).alias("m_login_id"))
    )
    a = {(r["event_id"], r["m_login_id"]) for r in out.collect()}
    b = {(r["event_id"], r["m_login_id"]) for r in naive.collect()}
    assert a == b and len(a) > 50


def test_range_join_bucketed_matches_naive(spark):
    from pipelines_rj_sms_spark.session import read_parquet_normalized

    ev = read_parquet_normalized(spark, "/root/testdata/sf0.001/events.parquet")
    errs = ev.filter("event_type = 'error'").select(
        "user_id", F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
        (F.col("ts") + F.expr("interval 1 hour")).alias("err_end"))
    purch = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purch_id"),
        F.col("ts").alias("purch_ts"))

    out = range_join_bucketed(purch, errs, "purch_ts", "err_ts", "err_end",
                              on="user_id", bucket_seconds=1800)
    naive = purch.alias("p").join(
        errs.alias("e"),
        (F.col("p.user_id") == F.col("e.user_id")) &
        F.col("p.purch_ts").between(F.col("e.err_ts"), F.col("e.err_end")))
    a = {(r["err_id"], r["purch_id"]) for r in out.collect()}
    b = {(r["err_id"], r["purch_id"]) for r in naive.collect()}
    assert a == b and len(a) > 0
    # exactly-once emission per matched pair
    assert out.count() == len(a)


def test_asof_matches_pandas_merge_asof_randomized(spark):
    # independent oracle: pandas merge_asof on 400 random trades x 300
    # random quotes over 20 keys (unique (key, ts) on the right — tie
    # order between identical right timestamps is undefined in both)
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    trades = pd.DataFrame({
        "k": rng.integers(0, 20, 400),
        "ts": pd.to_datetime(rng.integers(0, 10**6, 400), unit="s"),
        "trade_id": np.arange(400),
    })
    quotes = pd.DataFrame({
        "k": rng.integers(0, 20, 300),
        "ts": pd.to_datetime(rng.integers(0, 10**6, 300), unit="s"),
        "px": rng.random(300).round(4),
    }).drop_duplicates(["k", "ts"])

    expected = pd.merge_asof(
        trades.sort_values("ts"), quotes.sort_values("ts"),
        on="ts", by="k", direction="backward", allow_exact_matches=True)

    out = asof_join(spark.createDataFrame(trades),
                    spark.createDataFrame(quotes), on="k", right_prefix="q_")
    got = {r["trade_id"]: r["q_px"] for r in out.collect()}
    exp = {int(r.trade_id): (None if pd.isna(r.px) else float(r.px))
           for r in expected.itertuples()}
    assert got == exp


def test_asof_plan_single_shuffle(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole as-of is one hashpartitioning exchange (the window), not
    # a nested-loop join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_downsample_ohlc(spark):
    from pipelines_rj_sms_spark.operators.timeseries import downsample_ohlc

    rows = [
        ("a", datetime(2024, 1, 1, 10, 5), 3.0),
        ("a", datetime(2024, 1, 1, 10, 20), 9.0),
        ("a", datetime(2024, 1, 1, 10, 50), 1.0),
        ("a", datetime(2024, 1, 1, 11, 10), 7.0),
        ("b", datetime(2024, 1, 1, 10, 30), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = downsample_ohlc(df, "ts", "value", keys=["k"], interval="1 hour")
    got = {(r["k"], r["bucket_start"].hour): r for r in out.collect()}

    a10 = got[("a", 10)]
    assert (a10["open"], a10["high"], a10["low"], a10["close"]) == (3.0, 9.0, 1.0, 1.0)
    assert a10["n"] == 3
    assert abs(a10["mean_value"] - 13.0 / 3) < 1e-9
    assert got[("a", 11)]["open"] == 7.0
    assert got[("b", 10)]["n"] == 1


def test_downsample_ohlc_single_aggregation_plan(spark):
    """The rollup must be ONE hash aggregate pair (partial+final), not a
    window or self-join — the property that makes it scale."""
    from pipelines_rj_sms_spark.operators.timeseries import downsample_ohlc

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 10, 5), 3.0)],
        "k string, ts timestamp, value double")
    plan = downsample_ohlc(df, "ts", "value", keys=["k"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan


def test_gap_fill(spark):
    from pipelines_rj_sms_spark.operators.timeseries import gap_fill

    rows = [
        ("a", datetime(2024, 1, 1, 10), 5),
        ("a", datetime(2024, 1, 1, 13), 2),   # 11:00 and 12:00 missing
        ("b", datetime(2024, 1, 1, 0), 1),    # single bucket, no gaps
    ]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, qtd long")
    out = gap_fill(df, "bucket", keys=["k"], step="interval 1 hour",
                   fill={"qtd": 0})
    got = {(r["k"], r["bucket"].hour): r["qtd"] for r in out.collect()}
    assert got == {("a", 10): 5, ("a", 11): 0, ("a", 12): 0, ("a", 13): 2,
                   ("b", 0): 1}


def test_gap_fill_null_fill_default(spark):
    from pipelines_rj_sms_spark.operators.timeseries import gap_fill

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 10), 5.0),
         ("a", datetime(2024, 1, 1, 12), 7.0)],
        "k string, bucket timestamp, v double")
    out = gap_fill(df, "bucket", keys=["k"], step="interval 1 hour")
    vals = {r["bucket"].hour: r["v"] for r in out.collect()}
    assert vals[11] is None


def test_range_join_bucketed_left_preserves_unmatched(spark):
    import pytest
    from pipelines_rj_sms_spark.session import read_parquet_normalized

    ev = read_parquet_normalized(spark, "/root/testdata/sf0.001/events.parquet")
    errs = ev.filter("event_type = 'error'").select(
        "user_id", F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
        (F.col("ts") + F.expr("interval 1 hour")).alias("err_end"))
    purch = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purch_id"),
        F.col("ts").alias("purch_ts"))

    out = range_join_bucketed(purch, errs, "purch_ts", "err_ts", "err_end",
                              on="user_id", bucket_seconds=1800, how="left")
    naive = purch.alias("p").join(
        errs.alias("e"),
        (F.col("p.user_id") == F.col("e.user_id")) &
        F.col("p.purch_ts").between(F.col("e.err_ts"), F.col("e.err_end")),
        "left")
    a = sorted((r["purch_id"], r["err_id"]) for r in out.collect())
    b = sorted((r["purch_id"], r["err_id"]) for r in naive.collect())
    assert a == b
    # left join must keep unmatched points (round-1 bug: post-join filter
    # silently degraded left -> inner)
    assert any(e is None for _p, e in a)
    # keys come from the point side exactly once
    assert out.columns.count("user_id") == 1

    with pytest.raises(ValueError):
        range_join_bucketed(purch, errs, "purch_ts", "err_ts", "err_end",
                            on="user_id", how="full")


def test_overlap_join_equals_naive_nonequi(spark):
    """Bucketed overlap join == the naive non-equi join, including
    pairs spanning several buckets (emitted exactly once)."""
    import random
    from datetime import datetime, timedelta

    from pipelines_rj_sms_spark.operators.timeseries import overlap_join
    rng = random.Random(11)
    base = datetime(2024, 1, 1)

    def mk(n, pfx):
        rows = []
        for i in range(n):
            s = base + timedelta(minutes=rng.randint(0, 600))
            e = s + timedelta(minutes=rng.randint(0, 300))  # spans buckets
            rows.append((rng.randint(0, 3), i, s, e))
        return spark.createDataFrame(
            rows, f"k int, {pfx}_id int, {pfx}_s timestamp, {pfx}_e timestamp")

    left, right = mk(40, "l"), mk(40, "r")
    got = {(r["k"], r["l_id"], r["r_id"]) for r in overlap_join(
        left, right, "l_s", "l_e", "r_s", "r_e", on="k",
        bucket_seconds=3600).collect()}
    naive = left.join(right, "k").filter(
        (F.col("l_s") <= F.col("r_e")) & (F.col("r_s") <= F.col("l_e")))
    want = {(r["k"], r["l_id"], r["r_id"]) for r in naive.collect()}
    assert got == want and len(got) > 50


def test_concurrency_sweep_line(spark):
    from datetime import datetime

    from pipelines_rj_sms_spark.operators.timeseries import concurrency

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    df = spark.createDataFrame(
        [("a", t(0), t(10)), ("a", t(5), t(15)), ("a", t(10), t(20))],
        "k string, s timestamp, e timestamp")
    got = {r["ts"].minute: r["active"]
           for r in concurrency(df, "s", "e", ["k"]).collect()}
    # end-exclusive: at minute 10 the first interval closed, third opened
    assert got[0] == 1 and got[5] == 2 and got[10] == 2
    assert got[15] == 1 and got[20] == 0


def test_acf_hand_computed(spark):
    """u=[1..5]: d=5u−15, den=250; lag1 num=100 → 0.4; lag2 num=−25
    → −0.1; constant series → NULL acf."""
    from pipelines_rj_sms_spark.operators.timeseries import (
        autocorrelation)
    df = spark.createDataFrame(
        [(t, u) for t, u in enumerate([1, 2, 3, 4, 5])], ["t", "u"])
    out = {r["lag"]: r for r in
           autocorrelation(df, "t", "u", max_lag=2).collect()}
    assert out[1]["acf"] == 0.4 and out[1]["n"] == 5
    assert out[2]["acf"] == -0.1
    const = spark.createDataFrame([(0, 7), (1, 7), (2, 7)], ["t", "u"])
    for r in autocorrelation(const, "t", "u", max_lag=1).collect():
        assert r["acf"] is None


def test_acf_gaps_contribute_no_bridging_pairs(spark):
    """t=[0,1,3]: lag-1 pairs = {(0,1)} only — the gap never pairs."""
    from pipelines_rj_sms_spark.operators.timeseries import (
        autocorrelation)
    df = spark.createDataFrame([(0, 1), (1, 5), (3, 9)], ["t", "u"])
    out = {r["lag"]: r for r in
           autocorrelation(df, "t", "u", max_lag=2).collect()}
    # d = 3u−15 = [−12, 0, 12]; den = 288
    # lag1: only (0,1): (−12)(0) = 0 → acf 0.0
    # lag2: only (1,3): (0)(12) = 0 → acf 0.0
    assert out[1]["acf"] == 0.0 and out[2]["acf"] == 0.0


def test_acf_partition_invariant(spark):
    from pipelines_rj_sms_spark.operators.timeseries import (
        autocorrelation)
    import random
    rng = random.Random(3)
    df = spark.createDataFrame(
        [(t, rng.randrange(0, 1000)) for t in range(200)], ["t", "u"])
    a = {r["lag"]: r["acf"] for r in
         autocorrelation(df.repartition(1), "t", "u", 5).collect()}
    b = {r["lag"]: r["acf"] for r in
         autocorrelation(df.repartition(64), "t", "u", 5).collect()}
    assert a == b


def test_cross_correlation_detects_planted_shift(spark):
    """y is x shifted by +2 buckets: the lag=+2 correlation is the
    (near-)maximum and lag=0 is lower; a perfectly shifted copy pairs
    exactly where the spine overlaps."""
    from pipelines_rj_sms_spark.operators.timeseries import (
        cross_correlation)
    import random
    rng = random.Random(11)
    xs = [rng.randrange(0, 100) for _ in range(60)]
    rows = [(t, xs[t], xs[t - 2] if t >= 2 else 0)
            for t in range(60)]
    df = spark.createDataFrame(rows, ["t", "x", "y"])
    out = {r["lag"]: r["xcorr"] for r in
           cross_correlation(df, "t", "x", "y", max_lag=4).collect()}
    assert len(out) == 9
    best = max(out, key=lambda k: out[k])
    assert best == 2
    assert out[2] > 0.8 and out[2] > out[0]


def test_cross_correlation_constant_side_null(spark):
    from pipelines_rj_sms_spark.operators.timeseries import (
        cross_correlation)
    df = spark.createDataFrame(
        [(t, t % 5, 3) for t in range(20)], ["t", "x", "y"])
    for r in cross_correlation(df, "t", "x", "y", 2).collect():
        assert r["xcorr"] is None


def test_holt_winters_tracks_planted_trend_seasonality(spark):
    """y = 10·(t mod 7) + 0.5t: forecasts continue the pattern within
    a tolerance after 5 full seasons; short series → empty."""
    from pipelines_rj_sms_spark.operators.timeseries import (
        holt_winters_additive)
    rows = [(t, 10.0 * (t % 7) + 0.5 * t) for t in range(35)]
    df = spark.createDataFrame(rows, ["t", "y"])
    out = {r["h"]: r for r in
           holt_winters_additive(df, "t", "y", period=7,
                                 horizon=7).collect()}
    assert out[1]["n"] == 35
    for h, r in out.items():
        truth = 10.0 * ((35 + h - 1) % 7) + 0.5 * (35 + h - 1)
        assert abs(r["forecast"] - truth) < 1.5
    assert out[1]["trend"] > 0          # upward drift learned
    short = spark.createDataFrame(rows[:13], ["t", "y"])
    assert holt_winters_additive(short, "t", "y",
                                 period=7).count() == 0


def test_holt_winters_matches_reference_recursion(spark):
    """The Catalyst fold equals a plain-Python replay of the same
    recursion (identical init, identical update order) to 6 dp."""
    import random
    from pipelines_rj_sms_spark.operators.timeseries import (
        holt_winters_additive)
    rng = random.Random(17)
    ys = [50.0 + 8.0 * (t % 7) + 0.3 * t + rng.randrange(-3, 4)
          for t in range(42)]
    df = spark.createDataFrame(list(enumerate(ys)), ["t", "y"])
    m, a, b_, g = 7, 0.3, 0.1, 0.2
    l = sum(ys[:m]) / float(m)
    b = (sum(ys[m:2 * m]) / float(m) - sum(ys[:m]) / float(m)) / m
    s = [y - l for y in ys[:m]]
    for i in range(m, len(ys)):
        si = i % m
        l_new = a * (ys[i] - s[si]) + (1 - a) * (l + b)
        b = b_ * (l_new - l) + (1 - b_) * b
        s[si] = g * (ys[i] - l_new) + (1 - g) * s[si]
        l = l_new
    out = {r["h"]: r for r in
           holt_winters_additive(df, "t", "y", period=7,
                                 horizon=3).collect()}
    n = len(ys)
    for h in (1, 2, 3):
        want = l + h * b + s[(n + h - 1) % m]
        assert abs(out[h]["forecast"] - round(want, 6)) < 2e-6


def test_ljung_box_numpy_cross_check(spark):
    """Q on a fixed random series matches an independent numpy
    computation with the same rounded-ACF convention; a constant
    series (all ACFs undefined) returns NULL."""
    import random
    import numpy as np
    from pipelines_rj_sms_spark.operators.timeseries import ljung_box
    rng = random.Random(17)
    ys = [rng.randrange(0, 1000) for _ in range(120)]
    df = spark.createDataFrame(list(enumerate(ys)), ["t", "u"])
    out = ljung_box(df, "t", "u", max_lag=5).collect()[0]
    x = np.array(ys, dtype=float)
    n = len(x)
    d = x - x.mean()
    den = np.sum(d * d)
    q = 0.0
    for k in range(1, 6):
        rho = round(float(np.sum(d[:-k] * d[k:]) / den), 6)
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    assert out["n"] == 120 and out["m_lags"] == 5 and out["df"] == 5
    assert abs(out["q_stat"] - q) < 1e-4
    const = spark.createDataFrame(
        [(t, 7) for t in range(30)], ["t", "u"])
    assert ljung_box(const, "t", "u",
                     max_lag=3).collect()[0]["q_stat"] is None


def test_croston_hand_computed(spark):
    """Series [0, 3, 0, 0, 6]: init at t=1 (z=3, x=2), demand at t=4
    with q=2: z = .1*6+.9*3 = 3.3, x = .1*3+.9*2 = 2.1; rate 3.3/2.1
    and SBA = 0.95*rate. All-zero demand is NULL."""
    from pipelines_rj_sms_spark.operators.timeseries import (
        croston_forecast)
    rows = list(enumerate([0, 3, 0, 0, 6]))
    out = croston_forecast(
        spark.createDataFrame(rows, ["t", "y"]), "t", "y",
        alpha=0.1).collect()[0]
    assert out["n"] == 5 and out["n_nonzero"] == 2
    assert abs(out["size_hat"] - 3.3) < 1e-9
    assert abs(out["interval_hat"] - 2.1) < 1e-9
    assert abs(out["croston_rate"] - 3.3 / 2.1) < 1e-6
    assert abs(out["sba_rate"] - 0.95 * (3.3 / 2.1)) < 1e-6
    zero = spark.createDataFrame(
        [(t, 0) for t in range(4)], ["t", "y"])
    z = croston_forecast(zero, "t", "y").collect()[0]
    assert z["croston_rate"] is None and z["n_nonzero"] == 0


def test_hw_backtest_shape_and_perfect_series(spark):
    """A perfectly periodic series forecasts itself: APE ~ 0 on every
    held-out step when the pattern repeats exactly."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from pipelines_rj_sms_spark.operators.timeseries import (
        holt_winters_additive)
    pat = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    rows = [(t, pat[t % 7]) for t in range(6 * 7)]
    daily = spark.createDataFrame(rows, ["t", "y"])
    train = daily.filter(F.col("t") < 5 * 7)
    fc = holt_winters_additive(train, "t", "y", period=7,
                               alpha=0.3, beta=0.1, gamma=0.2,
                               horizon=7)
    test = (daily.filter(F.col("t") >= 5 * 7)
            .select(F.row_number().over(W.orderBy("t")).alias("h"),
                    F.col("y").alias("a")))
    out = fc.join(test, "h").collect()
    assert len(out) == 7
    for r in out:
        assert abs(r["forecast"] - r["a"]) < 0.5


def test_hurst_white_noise_near_half_and_trend_near_one(spark):
    """Seeded white noise gives H around 0.5 (R/S small-sample bias
    runs high, so allow a wide band but well below the trending
    case); a strong deterministic trend pushes H toward 1."""
    import random
    from pipelines_rj_sms_spark.operators.timeseries import hurst_rs
    rng = random.Random(12)
    noise = [(t, rng.randrange(0, 10000)) for t in range(512)]
    out = hurst_rs(spark.createDataFrame(noise, ["t", "u"]),
                   "t", "u").collect()
    h_noise = out[0]["hurst"]
    assert all(abs(r["hurst"] - h_noise) < 1e-9 for r in out)
    assert 0.3 < h_noise < 0.75
    trend = [(t, 100 * t + rng.randrange(0, 50)) for t in range(512)]
    h_trend = hurst_rs(
        spark.createDataFrame(trend, ["t", "u"]),
        "t", "u").collect()[0]["hurst"]
    assert h_trend > 0.9
    assert h_trend > h_noise + 0.2


def test_pacf_ar1_cuts_off_after_lag_one(spark):
    """An AR(1)-ish integer series: PACF lag 1 is large, lags 2+
    shrink sharply (the identification signature); cross-checked
    against an independent numpy Durbin-Levinson on the same
    rounded ACF inputs."""
    import random
    import numpy as np
    from pipelines_rj_sms_spark.operators.timeseries import pacf
    rng = random.Random(8)
    xs, x = [], 5000.0
    for _ in range(400):
        x = 0.7 * x + 0.3 * 5000 + rng.randrange(-500, 501)
        xs.append(int(x))
    df = spark.createDataFrame(list(enumerate(xs)), ["t", "u"])
    out = {r["lag"]: r for r in pacf(df, "t", "u",
                                     max_lag=4).collect()}
    rho = [out[k]["acf"] for k in range(1, 5)]
    # independent Durbin-Levinson replay
    p = [rho[0]]
    phi = [rho[0]]
    for k in range(2, 5):
        num = rho[k - 1] - sum(phi[j] * rho[k - 2 - j]
                               for j in range(k - 1))
        den = 1.0 - sum(phi[j] * rho[j] for j in range(k - 1))
        pkk = num / den
        phi = [phi[j] - pkk * phi[k - 2 - j]
               for j in range(k - 1)] + [pkk]
        p.append(pkk)
    for k in range(1, 5):
        assert abs(out[k]["pacf"] - p[k - 1]) < 1e-5
    assert out[1]["pacf"] > 0.5
    assert abs(out[2]["pacf"]) < 0.25
