"""Repartition-perturbation property: operators whose outputs are
hash-compared against the DuckDB oracle must be ORDER-INDEPENDENT —
identical results under repartition(1) and repartition(64), i.e. under
any partial-aggregation combine order. This is the regression gate for
the round-5 `doc_bigram_logprob` flake: a raw SUM(double) whose value
drifted with shuffle order and occasionally landed a round(…, 6)
boundary differently than the oracle.

The fix (functions/numeric.det_sum) quantizes each addend to 1e-9
fixed-point BIGINT units before summing, so the aggregate is exact and
commutative. These tests drive each converted operator at both
partitionings and require bit-identical collected rows — no tolerance.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")

needs_data = pytest.mark.skipif(not os.path.isdir(SF_DIR),
                                reason="driver testdata not present")


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _perturbed(df, fn, sort_cols):
    a = sorted(tuple(r) for r in fn(df.repartition(1)).collect())
    b = sorted(tuple(r) for r in fn(df.repartition(64)).collect())
    return a, b


@needs_data
def test_unigram_logprob_partition_invariant(spark):
    from pipelines_rj_sms_spark.operators.terms import unigram_logprob
    a, b = _perturbed(_docs(spark),
                      lambda d: unigram_logprob(d, "doc_id", "text"),
                      ["doc_id"])
    assert a == b


@needs_data
def test_bigram_logprob_partition_invariant(spark):
    from pipelines_rj_sms_spark.operators.terms import bigram_logprob
    a, b = _perturbed(_docs(spark),
                      lambda d: bigram_logprob(d, "doc_id", "text"),
                      ["doc_id"])
    assert a == b


@needs_data
def test_bm25_partition_invariant(spark):
    from pipelines_rj_sms_spark.operators.terms import bm25_top_k
    a, b = _perturbed(
        _docs(spark),
        lambda d: bm25_top_k(d, "doc_id", "text",
                             ["spark", "join", "vector"], k=15),
        ["doc_id"])
    assert a == b


def test_det_sum_exact_and_order_independent(spark):
    """Synthetic adversarial case: addends engineered so a naive
    double sum rounds differently depending on order (classic
    catastrophic-absorption pattern), while det_sum stays exact."""
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.functions.numeric import det_sum

    vals = [1e6, -1e6] + [1e-7] * 1000 + [3.333333e-7] * 777
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    outs = set()
    for n in (1, 7, 64):
        row = (df.repartition(n)
               .agg(det_sum(F.col("x")).alias("s")).collect()[0])
        outs.add(row["s"])
    assert len(outs) == 1
    # exact fixed-point expectation: each addend floor(x*1e9+0.5),
    # computed with the same IEEE ops the engines use
    import math
    expected = sum(math.floor(v * 1e9 + 0.5) for v in vals) / 1e9
    got = outs.pop()
    assert abs(got - expected) < 1e-12
