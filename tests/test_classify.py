import math


def _pin(x):
    # mirror of functions/numeric.det_log_units: 1e-6-grid pinned ln
    return math.floor(x * 1e6 + 0.5) / 1e6

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.classify import (
    nb_predict, nb_score, nb_train)


def _toy(spark):
    rows = [
        (1, "spam", "buy cheap pills now buy now"),
        (2, "spam", "cheap pills cheap offer"),
        (3, "ham", "meeting notes for the project"),
        (4, "ham", "project review meeting tomorrow"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "label", "text"])


def test_nb_train_model_shapes(spark):
    df = _toy(spark)
    terms, classes = nb_train(df, "label", "text")
    c = {r["label"]: r.asDict() for r in classes.collect()}
    assert set(c) == {"spam", "ham"}
    # equal priors: ln(2/4), pinned to the shared 1e-6 grid
    assert c["spam"]["ln_prior"] == _pin(math.log(0.5))
    t = {(r["label"], r["term"]): r["lw"] for r in terms.collect()}
    # "cheap" appears 3x in spam -> ln(4), pinned
    assert t[("spam", "cheap")] == _pin(math.log(4.0))
    assert ("ham", "cheap") not in t


def test_nb_score_matches_hand_computation(spark):
    df = _toy(spark)
    terms, classes = nb_train(df, "label", "text")
    scores = nb_score(df, "doc_id", "text", terms, classes)
    got = {(r["doc_id"], r["label"]): r["score"] for r in scores.collect()}
    # every (doc, class) pair present
    assert len(got) == 8
    # hand-compute doc 2 ("cheap pills cheap offer") under spam:
    # vocab V = distinct terms across both classes
    toks_spam = "buy cheap pills now buy now cheap pills cheap offer".split()
    toks_ham = ("meeting notes for the project "
                "project review meeting tomorrow").split()
    vocab = len(set(toks_spam) | set(toks_ham))
    denom = len(toks_spam) + vocab
    # hand model replays the engine's pinned-ln decomposition:
    # ln p(t|c) = lw - ln_denom with each ln pinned at 1e-6
    expect = _pin(math.log(0.5)) - 4 * _pin(math.log(denom))
    for tok in "cheap pills cheap offer".split():
        expect += _pin(math.log(toks_spam.count(tok) + 1))
    assert abs(got[(2, "spam")] - round(expect, 6)) < 2e-6


def test_nb_predict_separates_classes(spark):
    df = _toy(spark)
    terms, classes = nb_train(df, "label", "text")
    test = spark.createDataFrame(
        [(10, "cheap pills offer now"), (11, "project meeting review")],
        ["doc_id", "text"])
    pred = {r["doc_id"]: r["label"]
            for r in nb_predict(test, "doc_id", "text",
                                terms, classes).collect()}
    assert pred == {10: "spam", 11: "ham"}


def test_nb_score_probe_side_has_no_model_shuffle(spark):
    df = _toy(spark)
    terms, classes = nb_train(df, "label", "text")
    plan = nb_score(
        df, "doc_id", "text", terms, classes
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_nb_unknown_terms_fall_back_to_prior(spark):
    df = _toy(spark)
    terms, classes = nb_train(df, "label", "text")
    # all-unknown doc: score = ln_prior - dl * ln_denom, argmax = class
    # with the smaller denominator (ham has fewer tokens) given equal
    # priors
    test = spark.createDataFrame([(20, "zzz qqq")], ["doc_id", "text"])
    out = nb_predict(test, "doc_id", "text", terms, classes).collect()
    assert out[0]["label"] == "ham"


def test_classification_report_hand_computed(spark):
    from pipelines_rj_sms_spark.operators.cache import release
    from pipelines_rj_sms_spark.operators.classify import (
        classification_report)
    pairs = [("a", "a"), ("a", "a"), ("a", "b"),
             ("b", "b"), ("b", "a"),
             ("c", "a")]  # class c never predicted
    df = spark.createDataFrame(pairs, ["actual", "pred"])
    out = classification_report(df, "actual", "pred")
    got = {r["label"]: r.asDict() for r in out.collect()}
    release(out)
    # a: tp=2, pred_n=4, support=3
    assert got["a"]["precision"] == 0.5
    assert got["a"]["recall"] == round(2 / 3, 6)
    assert got["a"]["support"] == 3
    # b: tp=1, pred_n=2, support=2
    assert got["b"]["precision"] == 0.5 and got["b"]["recall"] == 0.5
    assert got["b"]["f1"] == 0.5
    # c: never predicted -> precision 0, recall 0, f1 0
    assert got["c"]["precision"] == 0.0 and got["c"]["f1"] == 0.0


def test_calibration_report_monotone_toy(spark):
    from pipelines_rj_sms_spark.operators.classify import (
        calibration_report)
    # scores 0..99; correct iff score >= 50 -> low buckets 0 accuracy,
    # high buckets 1.0
    rows = [(float(s), s >= 50) for s in range(100)]
    df = spark.createDataFrame(rows, ["score", "correct"])
    out = {r["bucket"]: r.asDict()
           for r in calibration_report(df, "score", "correct",
                                       n_buckets=4).collect()}
    assert out[0]["accuracy"] == 0.0
    assert out[3]["accuracy"] == 1.0
    assert sum(r["n"] for r in out.values()) == 100
    assert out[0]["mean_score"] < out[3]["mean_score"]


def test_brier_decomposition_hand_computed(spark):
    """Bin-constant forecasts: identity BS = REL - RES + UNC holds
    exactly (within_bin_term = 0). Forecasts 0.25 (bin 2) and 0.75
    (bin 7): outcome rates 0.5 and 1.0, base rate 0.75."""
    from pipelines_rj_sms_spark.operators.classify import (
        brier_decomposition)
    rows = [(0.25, 0), (0.25, 1), (0.75, 1), (0.75, 1)]
    out = brier_decomposition(
        spark.createDataFrame(rows, ["p", "y"]), "p", "y",
        n_bins=10).collect()[0]
    bs = (0.25 ** 2 + 0.75 ** 2 + 2 * 0.25 ** 2) / 4
    rel = 0.5 * (0.25 - 0.5) ** 2 + 0.5 * (0.75 - 1.0) ** 2
    res = 0.5 * (0.5 - 0.75) ** 2 + 0.5 * (1.0 - 0.75) ** 2
    unc = 0.75 * 0.25
    assert out["n"] == 4 and out["base_rate"] == 0.75
    assert abs(out["brier"] - bs) < 1e-6
    assert abs(out["reliability"] - rel) < 1e-6
    assert abs(out["resolution"] - res) < 1e-6
    assert abs(out["uncertainty"] - unc) < 1e-6
    assert abs(out["within_bin_term"]) < 1e-6


def test_brier_perfect_forecaster(spark):
    """p = o exactly: BS = 0 and the decomposition closes with
    REL = 0, RES = UNC. p = 1.0 exercises the top-bin clamp."""
    from pipelines_rj_sms_spark.operators.classify import (
        brier_decomposition)
    rows = [(0.0, 0)] * 3 + [(1.0, 1)] * 2
    out = brier_decomposition(
        spark.createDataFrame(rows, ["p", "y"]), "p", "y").collect()[0]
    assert out["brier"] == 0.0 and out["reliability"] == 0.0
    assert out["resolution"] == out["uncertainty"] == 0.24
