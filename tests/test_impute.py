"""Group-aware imputation (operators/impute.py)."""

import pytest
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.impute import impute_group_stats


def _df(spark):
    return spark.createDataFrame(
        [("a", 1.0, "x"), ("a", 3.0, "x"), ("a", None, "y"),
         ("b", 10.0, None), ("b", None, "z"), ("b", 20.0, "z")],
        "g string, v double, c string")


def test_impute_median_and_mean(spark):
    out = impute_group_stats(_df(spark), ["g"], {"v": "median"})
    filled = {r["g"]: r["v"] for r in out.filter("v_was_missing").collect()}
    assert filled == {"a": 2.0, "b": 15.0}    # medians of {1,3}, {10,20}
    untouched = out.filter("NOT v_was_missing").collect()
    assert sorted(r["v"] for r in untouched) == [1.0, 3.0, 10.0, 20.0]

    mean_out = impute_group_stats(_df(spark), ["g"], {"v": "mean"})
    got = {r["g"]: r["v"] for r in mean_out.filter("v_was_missing").collect()}
    assert got == {"a": 2.0, "b": 15.0}


def test_impute_mode_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("g", "p"), ("g", "q"), ("g", None)], "g string, c string")
    out = impute_group_stats(df, ["g"], {"c": "mode"})
    got = [r["c"] for r in out.filter("c_was_missing").collect()]
    assert got == ["q"]  # tie p/q at count 1 -> larger value wins


def test_impute_all_null_group_keeps_null_and_unknown_strategy_raises(spark):
    df = spark.createDataFrame([("g", None)], "g string, v double")
    out = impute_group_stats(df, ["g"], {"v": "median"}).collect()
    assert out[0]["v"] is None and out[0]["v_was_missing"] is True
    with pytest.raises(ValueError):
        impute_group_stats(df, ["g"], {"v": "nope"})


def test_impute_no_data_shuffle(spark):
    """The fact side must not exchange: fills join back broadcast."""
    df = _df(spark)
    plan = impute_group_stats(df, ["g"], {"v": "median"}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_standardize_global_and_grouped(spark):
    import pytest
    from pipelines_rj_sms_spark.operators.conform import standardize
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r["g"], r["v"]): r["v_z"]
           for r in standardize(df, ["v"], key_cols=["g"]).collect()}
    # group a: mean 2, sd sqrt(2) -> z = ±0.707107
    assert out[("a", 3.0)] == pytest.approx(0.707107, abs=1e-6)
    assert out[("a", 1.0)] == pytest.approx(-0.707107, abs=1e-6)
    # constant group -> null, never Inf
    assert out[("b", 10.0)] is None
    glob = standardize(df, ["v"]).collect()
    assert all(r["v_z"] is not None for r in glob)
