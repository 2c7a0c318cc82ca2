"""Bloom-filter semi-join prefiltering (operators/bloom.py)."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.bloom import (
    bloom_prefilter,
    bloom_semi_join,
    build_bloom,
    suggest_params,
)


def test_bloom_no_false_negatives_and_low_fp(spark):
    small = spark.range(0, 500).withColumnRenamed("id", "k")
    big = spark.range(0, 20000).withColumnRenamed("id", "k")
    pre = bloom_prefilter(big, small, "k", "k", m_bits=1 << 14, k=7)
    kept = {r["k"] for r in pre.collect()}
    assert set(range(500)) <= kept              # never drops a member
    fp = len(kept) - 500
    assert fp < 2000                            # ~1% fpp at this sizing


def test_bloom_semi_join_exact(spark):
    small = spark.range(0, 300, 3).withColumnRenamed("id", "k")  # multiples of 3
    big = spark.range(0, 1000).withColumnRenamed("id", "k")
    got = {r["k"] for r in bloom_semi_join(
        big, small, "k", "k", m_bits=1 << 12, k=5).collect()}
    want = {r["k"] for r in big.join(
        small, "k", "left_semi").collect()}
    assert got == want


def test_bloom_probe_side_has_no_exchange(spark):
    small = spark.range(0, 100).withColumnRenamed("id", "k")
    big = spark.range(0, 5000).withColumnRenamed("id", "k")
    plan = bloom_prefilter(big, small, "k", "k", m_bits=1 << 12, k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    # probe side: broadcast join only; the sole hash Exchange is the
    # bounded word->bits aggregation on the build side
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_suggest_params_textbook():
    m, k = suggest_params(1_000_000, 0.01)
    assert 9_000_000 < m < 10_500_000 and k in (6, 7)
    assert m % 64 == 0


def test_build_bloom_is_single_row_array(spark):
    b = build_bloom(spark.range(10).withColumnRenamed("id", "k"),
                    "k", m_bits=256, k=3).collect()
    assert len(b) == 1 and len(b[0]["bloom"]) == 4
