import pytest

from pipelines_rj_sms_spark.operators.analytics import survival_curve


def test_km_textbook_example(spark):
    # classic small K-M: events at t=1 (1), t=2 (1), censor at t=3,
    # event at t=4 (1), censor at t=5
    rows = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    out = {r["duration"]: r.asDict()
           for r in survival_curve(df, "dur", "ev").collect()}
    # t=1: n=5, d=1 -> S=0.8 ; t=2: n=4, d=1 -> 0.6
    # t=3: censor only -> S stays 0.6 ; t=4: n=2, d=1 -> 0.3
    assert out[1]["n_at_risk"] == 5
    assert out[1]["survival"] == pytest.approx(0.8, abs=1e-6)
    assert out[2]["survival"] == pytest.approx(0.6, abs=1e-6)
    assert out[3]["survival"] == pytest.approx(0.6, abs=1e-6)
    assert out[3]["n_events"] == 0 and out[3]["n_censored"] == 1
    assert out[4]["survival"] == pytest.approx(0.3, abs=1e-6)


def test_km_all_events_hits_zero_and_stays(spark):
    rows = [(1, 1), (1, 1), (2, 1)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    out = {r["duration"]: r["survival"]
           for r in survival_curve(df, "dur", "ev").collect()}
    assert out[1] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2] == 0.0  # risk set emptied exactly


def test_km_keyed_groups_independent(spark):
    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 9, 1)]
    df = spark.createDataFrame(rows, ["g", "dur", "ev"])
    out = {(r["g"], r["duration"]): r["survival"]
           for r in survival_curve(df, "dur", "ev",
                                   key_cols=["g"]).collect()}
    assert out[("a", 1)] == pytest.approx(0.5, abs=1e-6)
    assert out[("b", 1)] == pytest.approx(1.0, abs=1e-6)  # censor only
    assert out[("b", 9)] == 0.0


def test_nelson_aalen_hand_computed(spark):
    """Durations 1,1,2*,3 (*=censored at 2): H(1)=2/4=0.5,
    H(2)=0.5 (censoring adds nothing), H(3)=0.5+1/1=1.5;
    Var(1)=2/16=0.125 → se=0.353553."""
    from pipelines_rj_sms_spark.operators.analytics import nelson_aalen
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (3, 1)], ["dur", "ev"])
    out = {r["duration"]: r for r in
           nelson_aalen(df, "dur", "ev").collect()}
    assert out[1]["n_at_risk"] == 4 and out[1]["cum_hazard"] == 0.5
    assert out[2]["cum_hazard"] == 0.5 and out[2]["n_censored"] == 1
    assert out[3]["n_at_risk"] == 1 and out[3]["cum_hazard"] == 1.5
    assert out[1]["hazard_se"] == 0.353553


def test_nelson_aalen_tracks_km_for_small_hazards(spark):
    """exp(−H) ≈ KM survival when d/n is small — the textbook
    relationship; check they agree within 2% on a spread-out series."""
    import math
    from pipelines_rj_sms_spark.operators.analytics import (
        nelson_aalen, survival_curve)
    rows = [(d, 1) for d in range(1, 40) for _ in range(2)] + \
           [(40, 0)] * 60
    df = spark.createDataFrame(rows, ["dur", "ev"])
    na = {r["duration"]: r["cum_hazard"]
          for r in nelson_aalen(df, "dur", "ev").collect()}
    km = {r["duration"]: r["survival"]
          for r in survival_curve(df, "dur", "ev").collect()}
    for d in (10, 20, 30):
        assert abs(math.exp(-na[d]) - km[d]) < 0.02 * km[d] + 1e-9
