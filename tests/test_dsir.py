"""DSIR importance resampling (operators/curation.py)."""

import math

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.curation import (
    dsir_log_weights,
    dsir_select,
    feature_bucket,
)

DOCS = [
    # target (the distribution to match): repeated "aa bb"
    (0, "aa bb aa bb", True),
    (1, "aa bb aa", True),
    # pool: doc 2 looks like the target, doc 3 does not
    (2, "aa bb", False),
    (3, "zz qq zz qq", False),
]


def _expected_weights(n_buckets=512, alpha=1.0):
    def bucket(t):
        return (len(t) * 131 + ord(t[0]) * 7 + ord(t[-1])) % n_buckets

    ct_t, ct_r = {}, {}
    for _, text, is_t in DOCS:
        for t in text.lower().split():
            (ct_t if is_t else ct_r)[bucket(t)] = \
                (ct_t if is_t else ct_r).get(bucket(t), 0) + 1
    tt, tr = sum(ct_t.values()), sum(ct_r.values())

    def units(p):
        return math.floor(math.log(p) * 1e6 + 0.5)

    out = {}
    for did, text, _ in DOCS:
        s = 0
        for t in text.lower().split():
            b = bucket(t)
            s += (units((ct_t.get(b, 0) + alpha) / (tt + alpha * n_buckets))
                  - units((ct_r.get(b, 0) + alpha) / (tr + alpha * n_buckets)))
        out[did] = s / 1e6
    return out


def test_dsir_log_weights_hand_computed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, is_t boolean")
    got = {r["doc_id"]: r for r in
           dsir_log_weights(df, F.col("is_t"), n_buckets=512).collect()}
    want = _expected_weights()
    assert {k: v["log_weight"] for k, v in got.items()} == want
    assert got[0]["is_target"] and not got[3]["is_target"]
    assert got[0]["n_tokens"] == 4
    # target-like pool doc outranks the alien one
    assert got[2]["log_weight"] > got[3]["log_weight"]


def test_dsir_weights_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, is_t boolean")
    one = dsir_log_weights(df.coalesce(1), F.col("is_t"),
                           n_buckets=512).collect()
    many = dsir_log_weights(df.repartition(8), F.col("is_t"),
                            n_buckets=512).collect()
    assert {tuple(r) for r in one} == {tuple(r) for r in many}


def test_dsir_select_pool_only_and_deterministic(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, is_t boolean")
    sel = dsir_select(df, F.col("is_t"), k=1, n_buckets=512).collect()
    assert [r["doc_id"] for r in sel] == [2]      # target rows never selected
    both = dsir_select(df, F.col("is_t"), k=9, n_buckets=512).collect()
    assert [r["doc_id"] for r in both] == [2, 3]  # ordered by weight desc


def test_dsir_plan_broadcasts_bucket_dim_no_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, is_t boolean")
    plan = (dsir_log_weights(df, F.col("is_t"), n_buckets=512)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_feature_bucket_matches_python(spark):
    toks = ["hello", "中文", "a", "Straße"]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = [r[0] for r in
           df.select(feature_bucket(F.col("t"), 512)).collect()]
    want = [(len(t) * 131 + ord(t[0]) * 7 + ord(t[-1])) % 512 for t in toks]
    assert got == want


def test_dsir_empty_target_side_is_defined(spark):
    """No target docs: p_t collapses to the uniform smoothing prior
    (alpha / (0 + alpha*B)) — weights stay finite and well-defined."""
    df = spark.createDataFrame(
        [(1, "aa bb", False), (2, "cc dd", False)],
        "doc_id long, text string, is_t boolean")
    rows = dsir_log_weights(df, F.col("is_t"), n_buckets=64).collect()
    assert len(rows) == 2
    assert all(r["log_weight"] is not None for r in rows)
    import math
    assert all(math.isfinite(r["log_weight"]) for r in rows)
