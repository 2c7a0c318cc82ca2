from pyspark.sql import functions as F

from pipelines_rj_sms_spark.quality.expectations import (
    between, custom, isin, matches, not_null, run_expectations, unique)


def _df(spark):
    rows = [
        (1, "a@x.com", 10.0, "BR"),
        (2, "b@y.org", 250.0, "BR"),
        (2, None, 50.0, "US"),
        (4, "not-an-email", -5.0, "XX"),
    ]
    return spark.createDataFrame(rows, ["id", "email", "amount", "country"])


def test_expectations_report(spark):
    suite = [
        not_null("email", tolerance=0.3),
        unique("id"),
        between("amount", 0.0, 100.0, tolerance=0.25),
        isin("country", ["BR", "US"]),
        matches("email", r"^[^@]+@[^@]+\.[^@]+$", tolerance=0.5),
        custom("amount_positive", F.col("amount") > 0, tolerance=0.0),
    ]
    out = {r["expectation"]: r.asDict()
           for r in run_expectations(_df(spark), suite).collect()}
    assert out["email_not_null"]["n_violations"] == 1
    assert out["email_not_null"]["passed"]          # 0.25 <= 0.3
    assert out["id_unique"]["n_violations"] == 1    # duplicate id 2
    assert not out["id_unique"]["passed"]
    assert out["amount_between"]["n_violations"] == 2  # 250, -5
    assert not out["amount_between"]["passed"]      # 0.5 > 0.25
    assert out["country_isin"]["n_violations"] == 1  # XX
    assert out["email_matches"]["n_violations"] == 1  # nulls don't count
    assert out["email_matches"]["passed"]
    assert out["amount_positive"]["n_violations"] == 1


def test_expectations_single_aggregate_plan(spark):
    suite = [not_null("email"), between("amount", 0, 100),
             isin("country", ["BR"])]
    plan = run_expectations(_df(spark), suite) \
        ._jdf.queryExecution().executedPlan().toString()
    # one scan, not one per expectation
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Union" not in plan


def test_expectations_empty_input_passes(spark):
    df = spark.createDataFrame([], "id int, email string")
    out = run_expectations(df, [not_null("email")]).collect()
    assert out[0]["n_rows"] == 0 and out[0]["passed"]
