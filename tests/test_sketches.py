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


# ---------------------------------------------------------------------------
# Theta sketches: set algebra from sketch bytes
# ---------------------------------------------------------------------------

def test_theta_exact_below_nominal(spark, events):
    """Below 2**lg_k distinct members the theta sketch is a complete
    hash sample: estimates are exactly the true distinct counts."""
    from pipelines_rj_sms_spark.operators.sketches import (
        build_theta_sketches, theta_rollup)
    th = build_theta_sketches(events, ["event_type", "day"], "user_id")
    rolled = {r["event_type"]: r["distinct_estimate"]
              for r in theta_rollup(th, ["event_type"]).collect()}
    exact = {r["event_type"]: r["x"]
             for r in events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("x")).collect()}
    assert rolled == {k: float(v) for k, v in exact.items()}


def test_theta_intersection_and_difference_exact(spark):
    """Constructed segments with known overlap: intersection and
    difference estimates must be exact in the sub-nominal regime."""
    from pipelines_rj_sms_spark.operators.sketches import (
        build_theta_sketches, theta_pairwise_difference,
        theta_pairwise_overlap)
    df = spark.createDataFrame(
        [("a", i) for i in range(300)]            # a = 0..299
        + [("b", i) for i in range(200, 500)],    # b = 200..499, overlap 100
        ["seg", "uid"])
    th = build_theta_sketches(df, ["seg"], "uid")
    ov = theta_pairwise_overlap(th, "seg").collect()
    assert len(ov) == 1 and ov[0]["overlap_estimate"] == 100.0
    diff = {(r["key_a"], r["key_b"]): r["only_a_estimate"]
            for r in theta_pairwise_difference(th, "seg").collect()}
    assert diff == {("a", "b"): 200.0, ("b", "a"): 200.0}


def test_theta_parquet_roundtrip_merge(spark, events, tmp_path):
    """Theta sketch bytes survive the lakehouse roundtrip; merging the
    persisted fine grain equals sketching raw directly."""
    from pipelines_rj_sms_spark.operators.sketches import (
        build_theta_sketches, theta_rollup)
    out = str(tmp_path / "theta_rollup")
    build_theta_sketches(
        events, ["event_type", "day"], "user_id").write.parquet(out)
    rolled = {r["event_type"]: r["distinct_estimate"]
              for r in theta_rollup(
                  spark.read.parquet(out), ["event_type"]).collect()}
    direct = {r["event_type"]: r["distinct_estimate"]
              for r in theta_rollup(
                  build_theta_sketches(events, ["event_type"], "user_id"),
                  ["event_type"]).collect()}
    assert rolled == direct


# ---------------------------------------------------------------------------
# KLL sketches: mergeable quantiles
# ---------------------------------------------------------------------------

def test_kll_merge_rollup_rank_accuracy(spark, events):
    """Merged per-day sketches answer per-type quantiles with achieved
    rank within tolerance of the target rank (the KLL guarantee)."""
    from pipelines_rj_sms_spark.operators.sketches import (
        build_quantile_sketches, merge_quantile_rollup)
    fine = build_quantile_sketches(events, ["event_type", "day"], "value")
    rolled = merge_quantile_rollup(fine, ["event_type"],
                                   quantiles=(0.5, 0.9))
    est = {r["event_type"]: (r["q_50"], r["q_90"])
           for r in rolled.collect()}
    for etype, (v50, v90) in est.items():
        sub = events.filter(F.col("event_type") == etype)
        n = sub.count()
        r50 = sub.filter(F.col("value") <= v50).count() / n
        r90 = sub.filter(F.col("value") <= v90).count() / n
        assert abs(r50 - 0.5) <= 0.05, (etype, r50)
        assert abs(r90 - 0.9) <= 0.05, (etype, r90)


def test_kll_rollup_check_within_tolerance(spark, events):
    from pipelines_rj_sms_spark.operators.sketches import (
        quantile_rollup_check)
    rows = quantile_rollup_check(
        events, ["event_type"], "value", "day").collect()
    assert rows and all(r["within_tolerance"] for r in rows)
    # exact percentile columns present and ordered p50 <= p90 <= p99
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_kll_parquet_roundtrip(spark, events, tmp_path):
    from pipelines_rj_sms_spark.operators.sketches import (
        build_quantile_sketches, merge_quantile_rollup)
    out = str(tmp_path / "kll_rollup")
    build_quantile_sketches(
        events, ["event_type", "day"], "value").write.parquet(out)
    rolled = merge_quantile_rollup(
        spark.read.parquet(out), ["event_type"], quantiles=(0.5,))
    assert rolled.count() == events.select("event_type").distinct().count()
    assert "q_50" in rolled.columns and "row_count" in rolled.columns


# ---------------------------------------------------------------------------
# Count-min frequency table
# ---------------------------------------------------------------------------

def test_freq_sketch_never_undercounts(spark, events):
    from pipelines_rj_sms_spark.operators.sketches import (
        build_freq_sketch, freq_estimate)
    freq = build_freq_sketch(events, "user_id", depth=5, width=2048)
    # bounded state regardless of key cardinality
    assert freq.count() <= 5 * 2048
    exact = events.groupBy("user_id").agg(F.count("*").alias("c"))
    est = freq_estimate(freq, exact.select("user_id"), "user_id",
                        depth=5, width=2048)
    j = exact.join(est, "user_id")
    n = events.count()
    assert j.filter(F.col("freq_estimate") < F.col("c")).count() == 0
    over = j.select(F.max(F.col("freq_estimate") - F.col("c"))).collect()[0][0]
    assert over <= 3 * 5 * n / 2048


def test_freq_sketch_merge_is_additive(spark, events):
    """Union+sum of two CMS tables == CMS of the concatenated data; a
    key absent from the sketch estimates 0."""
    from pipelines_rj_sms_spark.operators.sketches import (
        build_freq_sketch, freq_estimate, merge_freq_sketches)
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = merge_freq_sketches(
        build_freq_sketch(half_a, "user_id"),
        build_freq_sketch(half_b, "user_id"))
    direct = build_freq_sketch(events, "user_id")
    diff = (merged.alias("m").join(
        direct.alias("d"),
        (F.col("m.d") == F.col("d.d"))
        & (F.col("m.bucket") == F.col("d.bucket")), "full")
        .filter(F.coalesce(F.col("m.cnt"), F.lit(0))
                != F.coalesce(F.col("d.cnt"), F.lit(0))))
    assert diff.count() == 0
    ghost = spark.createDataFrame([(10**12,)], ["user_id"])
    est = freq_estimate(direct, ghost, "user_id").collect()[0]
    # a never-seen key can only collide, never go negative
    assert est["freq_estimate"] >= 0


def test_new_sketch_plans_stay_jvm_side(spark, events):
    """Plan discipline for all three new families: hash aggregates, no
    Python eval nodes anywhere."""
    from pipelines_rj_sms_spark.operators.sketches import (
        build_freq_sketch, build_quantile_sketches, build_theta_sketches,
        merge_quantile_rollup, theta_rollup)
    plans = [
        theta_rollup(build_theta_sketches(
            events, ["event_type", "day"], "user_id"), ["event_type"]),
        merge_quantile_rollup(build_quantile_sketches(
            events, ["event_type", "day"], "value"), ["event_type"]),
        build_freq_sketch(events, "user_id"),
    ]
    for df in plans:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "HashAggregate" in plan


def test_cms_join_size_exact_when_no_collisions(spark):
    """Few distinct keys + wide table -> no bucket collisions -> the
    inner product IS the exact join size (sum of f_a(k)*f_b(k))."""
    from pipelines_rj_sms_spark.operators.sketches import (
        build_freq_sketch, cms_join_size)
    a = spark.createDataFrame([(k,) for k in [1, 1, 2, 3, 3, 3]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 3, 3, 4]], ["k"])
    ca = build_freq_sketch(a, "k", depth=3, width=1 << 14)
    cb = build_freq_sketch(b, "k", depth=3, width=1 << 14)
    est = cms_join_size(ca, cb, depth=3, width=1 << 14).collect()[0][0]
    exact = a.join(b, "k").count()            # 2*1 + 3*2 = 8
    assert est == exact == 8


def test_cms_join_size_never_undercounts(spark):
    from pyspark.sql import functions as F
    from pipelines_rj_sms_spark.operators.sketches import (
        build_freq_sketch, cms_join_size)
    a = spark.range(2000).select((F.col("id") % 537).alias("k"))
    b = spark.range(1000).select((F.col("id") % 211).alias("k"))
    ca = build_freq_sketch(a, "k", depth=5, width=256)   # narrow: collides
    cb = build_freq_sketch(b, "k", depth=5, width=256)
    est = cms_join_size(ca, cb, depth=5, width=256).collect()[0][0]
    exact = a.join(b, "k").count()
    assert est >= exact


def test_cms_join_size_disjoint_keys_zero(spark):
    from pipelines_rj_sms_spark.operators.sketches import (
        build_freq_sketch, cms_join_size)
    a = spark.createDataFrame([(1,), (2,)], ["k"])
    b = spark.createDataFrame([(900001,), (900002,)], ["k"])
    ca = build_freq_sketch(a, "k", depth=3, width=1 << 16)
    cb = build_freq_sketch(b, "k", depth=3, width=1 << 16)
    assert cms_join_size(ca, cb, depth=3, width=1 << 16) \
        .collect()[0][0] == 0
