from datetime import datetime

from pipelines_rj_sms_spark.operators.analytics import rfm_scores


def test_rfm_basic_dimensions(spark):
    T = datetime
    rows = [
        # whale: recent, frequent, big
        (1, T(2024, 3, 10), 500.0), (1, T(2024, 3, 11), 400.0),
        (1, T(2024, 3, 12), 600.0),
        # lapsed small
        (2, T(2024, 1, 1), 10.0),
        # middling
        (3, T(2024, 2, 15), 50.0), (3, T(2024, 2, 20), 60.0),
    ]
    df = spark.createDataFrame(rows, ["cust", "ts", "amt"])
    out = {r["entity"]: r.asDict()
           for r in rfm_scores(df, "cust", "ts", "amt",
                               n_tiers=3).collect()}
    assert out[1]["recency_days"] == 0
    assert out[1]["frequency"] == 3
    assert out[1]["monetary"] == 1500.0
    assert out[2]["recency_days"] == 71
    # whale dominates every score; lapsed bottom on all
    w, l = out[1], out[2]
    assert (w["r_score"], w["f_score"], w["m_score"]) == (3, 3, 3)
    assert (l["r_score"], l["f_score"], l["m_score"]) == (1, 1, 1)


def test_rfm_fixed_asof(spark):
    rows = [(1, datetime(2024, 1, 1), 5.0)]
    df = spark.createDataFrame(rows, ["cust", "ts", "amt"])
    out = rfm_scores(df, "cust", "ts", "amt",
                     asof_ts="2024-01-31 00:00:00").collect()[0]
    assert out["recency_days"] == 30


def test_rfm_single_scan_plan(spark):
    rows = [(1, datetime(2024, 1, 1), 5.0), (2, datetime(2024, 1, 2), 7.0)]
    df = spark.createDataFrame(rows, ["cust", "ts", "amt"])
    plan = rfm_scores(df, "cust", "ts", "amt")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    # 1-row broadcast frames only: asof + boundaries (+ the boundary
    # aggregation's own replay of the asof frame)
    assert plan.count("BroadcastNestedLoopJoin") <= 3


def test_rfm_approx_matches_exact_at_small_n(spark):
    """approx=True (bounded-memory tier boundaries): GK is exact
    below its compression threshold, so small-corpus tiers must match
    the exact path row for row — wiring gate; the skew/rank-error
    bound is proven in the equi-depth/winsorize units."""
    from datetime import datetime as T
    rows = [(i, T(2024, 1 + i % 3, 1 + i % 27), float(10 * i + 5))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["cust", "ts", "amt"])
    exact = {r["entity"]: (r["r_score"], r["f_score"], r["m_score"])
             for r in rfm_scores(df, "cust", "ts", "amt").collect()}
    approx = {r["entity"]: (r["r_score"], r["f_score"], r["m_score"])
              for r in rfm_scores(df, "cust", "ts", "amt",
                                  approx=True).collect()}
    assert exact == approx
