"""Hashed logistic regression (operators/classify.py logreg_*)."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.classify import (
    logreg_hashed_train,
    logreg_score,
)

# linearly separable by vocabulary: positives speak one language,
# negatives another
DOCS = [(i, "good clean prose flows here", 1) for i in range(6)] + [
    (i, "zz qq spam spam zz junk", 0) for i in range(6, 12)]


def _train(df, **kw):
    kw.setdefault("n_buckets", 64)
    kw.setdefault("n_iter", 6)
    return logreg_hashed_train(df, F.col("y") == 1, "text", "doc_id", **kw)


def test_logreg_separates_easy_corpus(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y int")
    w, feat = _train(df)
    out = {r["doc_id"]: r for r in logreg_score(feat, w).collect()}
    assert len(out) == 12
    assert all(out[i]["predicted"] == 1 for i in range(6))
    assert all(out[i]["predicted"] == 0 for i in range(6, 12))
    # probabilities ordered with the labels and on the 1e-6 grid
    assert min(out[i]["prob"] for i in range(6)) > \
        max(out[i]["prob"] for i in range(6, 12))
    assert all(round(r["prob"] * 1e6) == r["prob"] * 1e6
               for r in out.values())


def test_logreg_weights_partition_invariant(spark):
    """Bit-identical weights at any partitioning — the integer-grid
    training contract."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y int")
    w1, _ = _train(df.coalesce(1))
    w8, _ = _train(df.repartition(8))
    assert ({tuple(r) for r in w1.collect()}
            == {tuple(r) for r in w8.collect()})


def test_logreg_intercept_present_and_zero_iter_is_half(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y int")
    w, feat = _train(df, n_iter=0)
    rows = w.collect()
    assert any(r["b"] == -1 for r in rows)        # intercept bucket
    assert all(r["wu"] == 0 for r in rows)        # no updates ran
    out = logreg_score(feat, w).collect()
    assert all(r["prob"] == 0.5 and r["margin"] == 0.0 for r in out)
    # zero margin predicts positive by the documented >= 0 rule
    assert all(r["predicted"] == 1 for r in out)


def test_logreg_training_reduces_logloss(spark):
    import math

    df = spark.createDataFrame(DOCS, "doc_id long, text string, y int")

    def logloss(n_iter):
        w, feat = _train(df, n_iter=n_iter)
        eps = 1e-9
        return sum(
            -math.log(max(r["prob"], eps)) if r["y"] == 1
            else -math.log(max(1 - r["prob"], eps))
            for r in logreg_score(feat, w).collect())

    assert logloss(6) < logloss(1) < logloss(0)


def test_logreg_plan_no_cartesian_no_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y int")
    w, feat = _train(df, n_iter=2)
    plan = (logreg_score(feat, w)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
