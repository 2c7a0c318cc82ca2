"""HLL sketch rollups: merge lattice correctness + lakehouse roundtrip.

The property that makes the rollup pattern safe at 100 TB is that
union-of-fine-sketches is *identical* (not just close) to sketching
the raw values directly at the same lg_k — register-wise max loses
nothing. These tests pin that, the parquet-roundtrip of the binary
sketch column, idempotent re-merge, and the accuracy audit that the
declared query's oracle relies on.
"""

import os

import pytest
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.sketches import (
    build_sketches,
    distinct_rollup_check,
    estimate,
    merge_rollup,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


@pytest.fixture(scope="module")
def events(spark):
    from pipelines_rj_sms_spark.session import read_parquet_normalized
    ev = read_parquet_normalized(spark, os.path.join(SF_DIR, "events.parquet"))
    return ev.withColumn("day", F.to_date("ts"))


def test_merge_equals_direct_sketch(spark, events):
    """Union of per-day sketches == one sketch over everything: the
    estimates must be bit-identical, per event_type."""
    fine = build_sketches(events, ["event_type", "day"], "user_id")
    rolled = merge_rollup(fine, ["event_type"])
    direct = (
        build_sketches(events, ["event_type"], "user_id")
        .select("event_type", estimate("distinct_sketch").alias("direct_est"))
    )
    joined = rolled.join(direct, "event_type").collect()
    assert joined
    for r in joined:
        assert r["distinct_estimate"] == r["direct_est"]


def test_remerge_idempotent(spark, events):
    """Merging the same day twice must not inflate the estimate
    (register-wise max is idempotent) — the reruns-safe property."""
    fine = build_sketches(events, ["event_type", "day"], "user_id")
    doubled = fine.unionAll(fine)
    once = {r["event_type"]: r["distinct_estimate"]
            for r in merge_rollup(fine, ["event_type"]).collect()}
    twice = {r["event_type"]: r["distinct_estimate"]
             for r in merge_rollup(doubled, ["event_type"]).collect()}
    assert {k: v for k, v in once.items()} == twice
    # but row_count (a plain sum) doubles — the two aggregates differ
    rc = {r["event_type"]: r["row_count"]
          for r in merge_rollup(fine, ["event_type"]).collect()}
    rc2 = {r["event_type"]: r["row_count"]
           for r in merge_rollup(doubled, ["event_type"]).collect()}
    assert all(rc2[k] == 2 * rc[k] for k in rc)


def test_parquet_roundtrip_then_merge(spark, events, tmp_path):
    """The write-time/read-time split: persist fine-grain sketch bytes,
    read them back, merge to a coarser grain — the persisted rollup
    answers without touching raw events."""
    out = str(tmp_path / "rollup")
    build_sketches(events, ["event_type", "day"], "user_id").write.parquet(out)
    persisted = spark.read.parquet(out)
    rolled = {r["event_type"]: r["distinct_estimate"]
              for r in merge_rollup(persisted, ["event_type"]).collect()}
    exact = {r["event_type"]: r["x"]
             for r in events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("x")).collect()}
    assert set(rolled) == set(exact)
    for k in exact:
        assert abs(rolled[k] - exact[k]) / exact[k] <= 0.05


def test_total_rollup_no_groups(spark, events):
    row = merge_rollup(
        build_sketches(events, ["day"], "user_id"), []).collect()[0]
    exact = events.agg(F.count_distinct("user_id")).collect()[0][0]
    assert abs(row["distinct_estimate"] - exact) / exact <= 0.05
    assert row["row_count"] == events.count()


def test_rollup_check_all_within_tolerance(spark, events):
    out = distinct_rollup_check(events, ["event_type"], "user_id", "day")
    rows = out.collect()
    assert rows
    assert all(r["within_tolerance"] for r in rows)
    assert {r.event_type for r in rows} == {
        r.event_type for r in events.select("event_type").distinct().collect()}


def test_sketch_plan_is_two_hash_aggregates(spark, events):
    """Plan discipline: build+merge is partial/final hash aggregation —
    no Python (BatchEvalPython/ArrowEval) anywhere; the shuffle carries
    sketch registers, not raw values."""
    plan = merge_rollup(
        build_sketches(events, ["event_type", "day"], "user_id"),
        ["event_type"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_pairwise_overlap_inclusion_exclusion(spark, events):
    from pipelines_rj_sms_spark.operators.sketches import pairwise_overlap

    sk = build_sketches(events, ["event_type"], "user_id")
    est = {(r["key_a"], r["key_b"]): r["overlap_estimate"]
           for r in pairwise_overlap(sk, "event_type").collect()}
    t = events.select("event_type", "user_id").distinct()
    exact = {(r["a"], r["b"]): r["n"] for r in
             t.alias("x").join(
                 t.alias("y"),
                 (F.col("x.user_id") == F.col("y.user_id"))
                 & (F.col("x.event_type") < F.col("y.event_type")))
             .groupBy(F.col("x.event_type").alias("a"),
                      F.col("y.event_type").alias("b"))
             .agg(F.count("*").alias("n")).collect()}
    assert set(est) >= set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / n <= 0.1, (k, est[k], n)


def test_pairwise_overlap_disjoint_sets_near_zero(spark):
    from pipelines_rj_sms_spark.operators.sketches import (
        build_sketches as bs, pairwise_overlap as po)

    df = spark.createDataFrame(
        [("a", i) for i in range(200)] + [("b", 1000 + i) for i in range(200)],
        ["seg", "uid"])
    sk = bs(df, ["seg"], "uid")
    row = po(sk, "seg").collect()[0]
    # disjoint segments: estimate must be tiny relative to set sizes
    assert row["overlap_estimate"] <= 10
