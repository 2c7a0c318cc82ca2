import math
import statistics
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.analytics import cusum_deviations
from pipelines_rj_sms_spark.quality.stats import (
    benford_first_digit, welch_t_test)


def test_welch_t_matches_scipy_formula(spark):
    a = [10.1, 12.3, 9.8, 11.5, 10.9, 12.0]
    b = [13.2, 14.1, 12.8, 15.0, 13.7]
    rows = [("a", v) for v in a] + [("b", v) for v in b] \
        + [("c", 99.0)]  # other groups ignored
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = welch_t_test(df, "grp", "val", "a", "b").collect()[0]
    va, vb = statistics.variance(a), statistics.variance(b)
    na, nb = len(a), len(b)
    se = va / na + vb / nb
    t = (statistics.mean(a) - statistics.mean(b)) / math.sqrt(se)
    dof = se ** 2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["t_stat"] == pytest.approx(t, abs=1e-6)
    assert out["deg_freedom"] == pytest.approx(dof, abs=1e-6)


def test_benford_digit_extraction_and_chi2(spark):
    # values whose first significant digits are known after the
    # fixed-point (x*100) rendering
    vals = [1.23, 19.99, 123.0, 2.5, 29.0, 3.14, 0.42, -5.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], ["val"])
    out = {r["first_digit"]: r.asDict()
           for r in benford_first_digit(df, "val").collect()}
    # -5.0 and 0.0 excluded; 0.42 -> units 42 -> digit 4
    assert sum(r["n"] for r in out.values()) == 7
    assert out[1]["n"] == 3 and out[2]["n"] == 2 and out[3]["n"] == 1
    assert out[4]["n"] == 1
    assert out[1]["expected_share"] == pytest.approx(
        math.log10(2), abs=1e-6)
    e = 7 * math.log10(2)
    assert out[1]["chi2_term"] == pytest.approx((3 - e) ** 2 / e, abs=1e-5)


def test_cusum_flags_level_shift(spark):
    # flat 10s then flat 20s: |cusum| peaks at the break
    rows = [(datetime(2024, 1, 1, h), 10.0) for h in range(8)] \
        + [(datetime(2024, 1, 2, h), 20.0) for h in range(8)]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = cusum_deviations(df, "ts", "v", threshold_sigmas=0.5)
    got = out.orderBy("ts").collect()
    cusums = [r["cusum"] for r in got]
    # mean = 15 -> cusum walks to -40 at the boundary then back to 0
    assert min(cusums) == pytest.approx(-40.0)
    assert cusums[-1] == pytest.approx(0.0)
    assert got[7]["exceeds"]  # the break point exceeds the band


def test_cusum_keyed_series_independent(spark):
    rows = [("a", datetime(2024, 1, 1, h), float(h)) for h in range(4)] \
        + [("b", datetime(2024, 1, 1, h), 5.0) for h in range(4)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = cusum_deviations(df, "ts", "v", key_cols=["k"])
    got = {(r["k"], r["ts"].hour): r["cusum"] for r in out.collect()}
    # constant series: cusum identically 0
    assert all(got[("b", h)] == 0.0 for h in range(4))
    # mean of a = 1.5 -> cusums -1.5, -2, -1.5, 0
    assert got[("a", 3)] == pytest.approx(0.0)
    assert got[("a", 1)] == pytest.approx(-2.0)


def test_concentration_metrics_known_values(spark):
    from pipelines_rj_sms_spark.operators.analytics import (
        concentration_metrics)
    # group a: perfectly equal -> gini 0, hhi 1/4
    rows = [("a", 10.0)] * 4 + [("b", 0.00001), ("b", 100.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r.asDict()
           for r in concentration_metrics(df, ["g"], "v").collect()}
    assert got["a"]["gini"] == 0.0
    assert got["a"]["hhi"] == 0.25
    assert got["a"]["top_share"] == 0.25
    # group b: near-total concentration
    assert got["b"]["gini"] > 0.49
    assert got["b"]["hhi"] > 0.99
    assert got["b"]["top_share"] > 0.99


def test_concentration_tie_order_invariant(spark):
    from pipelines_rj_sms_spark.operators.analytics import (
        concentration_metrics)
    import random
    rows = [("g", float(v)) for v in [5, 5, 5, 9, 9, 1]]
    rng = random.Random(3)
    for _ in range(3):
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, ["g", "v"]).repartition(4)
        r = concentration_metrics(df, ["g"], "v").collect()[0]
        assert r["gini"] == pytest.approx(0.254902, abs=1e-6)


def test_trend_fit_exact_line(spark):
    from pipelines_rj_sms_spark.operators.analytics import trend_fit
    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(10)] \
        + [("b", 0.0, 5.0), ("b", 1.0, 4.0), ("b", 2.0, 5.0)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r["g"]: r.asDict()
           for r in trend_fit(df, "x", "y", key_cols=["g"]).collect()}
    assert got["a"]["slope"] == pytest.approx(2.0)
    assert got["a"]["intercept"] == pytest.approx(1.0)
    assert got["a"]["r2"] == pytest.approx(1.0)
    assert got["b"]["slope"] == pytest.approx(0.0)
    assert got["b"]["r2"] == pytest.approx(0.0)


def test_period_over_period(spark):
    from datetime import datetime
    from pipelines_rj_sms_spark.operators.analytics import (
        period_over_period)
    rows = [(datetime(2024, m, 1), float(m * 10)) for m in range(1, 5)]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = {r["ts"].month: r.asDict() for r in period_over_period(
        df, "ts", "v").collect()}
    assert out[1]["prev_value"] is None and out[1]["growth"] is None
    assert out[2]["delta"] == 10.0
    assert out[2]["growth"] == 1.0
    assert out[4]["growth"] == pytest.approx(round(10 / 30, 6))


def test_seasonal_profile_dow(spark):
    from datetime import datetime
    from pipelines_rj_sms_spark.operators.analytics import (
        seasonal_profile)
    # 2024-01-07 is a Sunday (dayofweek=1)
    rows = [(datetime(2024, 1, 7), 10.0), (datetime(2024, 1, 14), 20.0),
            (datetime(2024, 1, 8), 40.0)]  # Mondays heavier
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = {r["season_idx"]: r.asDict() for r in seasonal_profile(
        df, "ts", "v", season="dow").collect()}
    assert out[1]["season_mean"] == 15.0      # Sundays
    assert out[2]["season_mean"] == 40.0      # Monday
    assert out[1]["overall_mean"] == pytest.approx(round(70 / 3, 6))
    assert out[2]["seasonal_index"] == pytest.approx(
        round(40 / (70 / 3), 6))


def test_theil_sen_ignores_outlier(spark):
    from pipelines_rj_sms_spark.operators.analytics import theil_sen_trend
    # y = 3x + 2 with one wild outlier that would wreck OLS
    rows = [("a", float(x), 3.0 * x + 2.0) for x in range(10)]
    rows[5] = ("a", 5.0, 1000.0)
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = theil_sen_trend(df, "x", "y", key_cols=["g"]).collect()[0]
    assert out["slope"] == pytest.approx(3.0, abs=1e-6)
    assert out["intercept"] == pytest.approx(2.0, abs=1e-6)
    assert out["n_pairs"] == 45


def test_change_decomposition_shares_sum_to_one(spark):
    from pipelines_rj_sms_spark.operators.analytics import (
        change_decomposition)
    rows = [("2023", "x", 100), ("2023", "y", 50),
            ("2024", "x", 160), ("2024", "y", 40),
            ("2022", "x", 999)]  # other periods ignored
    df = spark.createDataFrame(rows, ["period", "seg", "v"])
    out = {r["seg"]: r.asDict() for r in change_decomposition(
        df, "period", ["seg"], "v", "2023", "2024").collect()}
    assert out["x"]["delta"] == 60 and out["y"]["delta"] == -10
    assert out["x"]["share_of_change"] == pytest.approx(1.2)
    assert out["y"]["share_of_change"] == pytest.approx(-0.2)
    assert sum(r["share_of_change"] for r in out.values()) \
        == pytest.approx(1.0)


def test_two_proportion_test_formula(spark):
    import math
    from pyspark.sql import functions as F
    from pipelines_rj_sms_spark.quality.stats import two_proportion_test
    rows = [("a", True)] * 30 + [("a", False)] * 70 \
        + [("b", True)] * 50 + [("b", False)] * 50 \
        + [("c", True)] * 5
    df = spark.createDataFrame(rows, ["g", "ok"])
    out = two_proportion_test(df, "g", F.col("ok"), "a", "b").collect()[0]
    assert (out["n_a"], out["n_b"]) == (100, 100)
    assert out["rate_a"] == 0.3 and out["rate_b"] == 0.5
    pooled = 80 / 200
    se = math.sqrt(pooled * (1 - pooled) * (1 / 100 + 1 / 100))
    assert out["z_stat"] == pytest.approx(round((0.3 - 0.5) / se, 6))


def test_psi_detects_shift_and_is_zero_on_identical(spark):
    from pipelines_rj_sms_spark.quality.stats import (
        population_stability_index)
    ref = spark.range(2000).select(
        (F.col("id") % 100).cast("double").alias("v"))
    same = population_stability_index(ref, ref, "v", n_bins=10).collect()
    assert all(r["psi_term"] == 0.0 for r in same)
    assert same[0]["psi_total"] == 0.0
    shifted = spark.range(2000).select(
        ((F.col("id") % 100) + 60).cast("double").alias("v"))
    drift = population_stability_index(ref, shifted, "v",
                                       n_bins=10).collect()
    assert drift[0]["psi_total"] > 0.25  # "shifted" per the folklore


def test_fs_weights_separate_matches_from_nonmatches(spark):
    from pipelines_rj_sms_spark.operators.linkage import (
        fs_score, fs_u_probabilities)
    left = spark.createDataFrame(
        [(i, f"name{i}", i % 5) for i in range(200)],
        ["id", "name", "grp"])
    right = spark.createDataFrame(
        [(i + 1000, f"name{i}", i % 5) for i in range(200)],
        ["id", "name", "grp"])
    agree = {"name": F.col("l_name") == F.col("r_name"),
             "grp": F.col("l_grp") == F.col("r_grp")}
    u = fs_u_probabilities(left, right, agree, sample_pairs=100)
    assert 0 < u["name"] < 0.1      # chance name agreement is rare
    assert 0.1 < u["grp"] < 0.4     # 5 groups -> ~0.2 by chance
    m = {"name": 0.95, "grp": 0.95}
    l = left.select(*[F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select(*[F.col(c).alias(f"r_{c}")
                       for c in right.columns])
    pairs = l.join(r, F.col("l_grp") == F.col("r_grp"))
    scored = pairs.select(
        "l_id", "r_id", fs_score(m, u, agree).alias("w"))
    true_w = [r["w"] for r in scored.filter(
        F.col("r_id") - F.col("l_id") == 1000).collect()]
    false_w = [r["w"] for r in scored.filter(
        F.col("r_id") - F.col("l_id") != 1000).collect()]
    assert min(true_w) > max(false_w)  # clean separation


def test_fs_u_pairing_bounded_when_corpus_exceeds_samples(spark):
    """sample_pairs << corpus: the per-bucket argmin keeps the pairing
    at most 1:1 per bucket — never the (n/samples)^2 fan-out a raw
    rank join would produce. 2000 rows into 16 buckets must evaluate
    agreement over <= 16 pairs (and the estimate still lands near the
    chance rate)."""
    from pipelines_rj_sms_spark.operators.linkage import (
        fs_u_probabilities)
    left = spark.createDataFrame(
        [(i, i % 4) for i in range(2000)], ["id", "grp"])
    right = spark.createDataFrame(
        [(i + 10_000, i % 4) for i in range(2000)], ["id", "grp"])
    agree = {"grp": F.col("l_grp") == F.col("r_grp")}
    u = fs_u_probabilities(left, right, agree, sample_pairs=16)
    # 4 groups -> chance agreement ~0.25; 16 samples is noisy but the
    # estimate must be a small-sample average, not a blown-up join
    assert 0.0 < u["grp"] < 0.8


def test_psi_approx_edges_close_to_exact(spark):
    from pipelines_rj_sms_spark.quality.stats import (
        population_stability_index)
    ref = spark.range(5000).select(
        (F.col("id") % 997).cast("double").alias("v"))
    cur = spark.range(5000).select(
        ((F.col("id") % 997) + 100).cast("double").alias("v"))
    exact = population_stability_index(ref, cur, "v").collect()
    approx = population_stability_index(ref, cur, "v",
                                        approx_edges=True).collect()
    assert abs(exact[0]["psi_total"] - approx[0]["psi_total"]) < 0.05


def test_winsorize_column_exact_clamps_tails(spark):
    from pipelines_rj_sms_spark.quality.stats import winsorize_column
    # 1..100 uniform: p05 boundary = 5.95, p95 = 95.05 (exact
    # (n-1)p interpolation); interior values pass through unclipped
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v"))
    out = {r["k"]: r["clipped"]
           for r in winsorize_column(df, "k", "v").collect()}
    assert out[1] == 5.95 and out[3] == 5.95
    assert out[100] == 95.05 and out[98] == 95.05
    assert out[50] == 50.0 and out[6] == 6.0 and out[95] == 95.0


def test_winsorize_column_approx_within_rank_error(spark):
    """Approx (bounded-memory) clamp thresholds on a skewed column sit
    within the sketch's rank-error band of the exact ones: the SET OF
    CLIPPED ROWS differs from exact by at most eps*n per tail. (The
    clamp VALUE legitimately differs on every clipped row — exact
    interpolates between data values, the sketch returns an actual
    one — so the invariant is membership, not the emitted value.)"""
    from pipelines_rj_sms_spark.quality.stats import winsorize_column
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * F.col("id") % 99991).cast("double").alias("v"))

    def _clip_set(out):
        return {r["k"] for r in
                out.join(df, "k")
                .filter(F.col("clipped") != F.round("v", 6))
                .select("k").collect()}

    exact = _clip_set(winsorize_column(df, "k", "v"))
    approx = _clip_set(winsorize_column(df, "k", "v", approx=True,
                                        approx_accuracy=1000))
    # membership may differ only inside the rank-error band of each
    # tail threshold: eps*n per tail, 2 tails
    assert len(exact ^ approx) <= 2 * (1.0 / 1000) * n
    # both paths clip ~5% + 5% of rows
    assert abs(len(exact) - 0.10 * n) <= 0.02 * n


def test_mad_outlier_flags_exact_known(spark):
    from pipelines_rj_sms_spark.quality.stats import mad_outlier_flags
    # median 5, MAD 2 -> cut 3*1.4826*2 = 8.8956: only the 100.0
    # planted spike exceeds |v-5| > 8.8956
    vals = [1.0, 3.0, 4.0, 5.0, 5.0, 6.0, 7.0, 9.0, 100.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["k", "v"])
    out = {r["k"]: r["is_outlier"]
           for r in mad_outlier_flags(df, "k", "v").collect()}
    assert out[8] is True
    assert all(out[i] is False for i in range(8))


def test_mad_outlier_flags_approx_agrees_outside_band(spark):
    """Approx medians move each cut by at most the rank error; flags
    may only flip for rows inside that band — on a corpus where the
    planted outliers sit far beyond it, approx == exact."""
    from pipelines_rj_sms_spark.quality.stats import mad_outlier_flags
    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 1000 == 0, F.lit(1e7))
        .otherwise((F.col("id") % 997).cast("double")).alias("v"))
    exact = {r["k"]: r["is_outlier"]
             for r in mad_outlier_flags(df, "k", "v").collect()}
    approx = {r["k"]: r["is_outlier"]
              for r in mad_outlier_flags(df, "k", "v", approx=True,
                                         approx_accuracy=1000).collect()}
    assert exact == approx
    assert sum(exact.values()) == n // 1000


def test_jsd_identical_distributions_zero(spark):
    """Same distribution in both groups → every term 0, total 0."""
    from pipelines_rj_sms_spark.quality.stats import (
        jensen_shannon_divergence)
    rows = [("a", float(v)) for v in range(10) for _ in range(3)] + \
           [("b", float(v)) for v in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = jensen_shannon_divergence(df, "g", "v", "a", "b",
                                    lo=0.0, hi=10.0, n_bins=5).collect()
    assert all(r["jsd_term"] == 0.0 for r in out)
    assert all(r["jsd_total"] == 0.0 for r in out)


def test_jsd_disjoint_distributions_ln2(spark):
    """Fully disjoint supports → JSD = ln 2 ≈ 0.693147 (the bound)."""
    from pipelines_rj_sms_spark.quality.stats import (
        jensen_shannon_divergence)
    rows = [("a", 1.0)] * 20 + [("b", 9.0)] * 20
    df = spark.createDataFrame(rows, ["g", "v"])
    out = jensen_shannon_divergence(df, "g", "v", "a", "b",
                                    lo=0.0, hi=10.0, n_bins=5).collect()
    assert out[0]["jsd_total"] == 0.693147


def test_jsd_outliers_clamp_to_edge_bins(spark):
    """Values past [lo, hi) land in bins 0 / n_bins−1, never NULL."""
    from pipelines_rj_sms_spark.quality.stats import (
        jensen_shannon_divergence)
    rows = [("a", -50.0)] * 5 + [("a", 3.0)] * 5 + [("b", 99.0)] * 10
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["bin"] for r in jensen_shannon_divergence(
        df, "g", "v", "a", "b", lo=0.0, hi=10.0, n_bins=5).collect()}
    assert out == {0, 1, 4}


def test_dispersion_index_hand_computed(spark):
    """counts [2,4,6]: n=3, S=12, Q=56; var=(3·56−144)/6=4, mean=4 →
    VMR=1.0, chi2=2.0. Constant counts → VMR=0. n=1 → NULL."""
    from pipelines_rj_sms_spark.quality.stats import dispersion_index
    rows = ([("a", 2), ("a", 4), ("a", 6)]
            + [("b", 5), ("b", 5)] + [("c", 9)])
    df = spark.createDataFrame(rows, ["k", "c"])
    out = {r["k"]: r for r in
           dispersion_index(df, "c", ["k"]).collect()}
    assert out["a"]["vmr"] == 1.0 and out["a"]["chi2"] == 2.0
    assert out["a"]["mean"] == 4.0 and out["a"]["n"] == 3
    assert out["b"]["vmr"] == 0.0
    assert out["c"]["vmr"] is None


def test_runs_test_hand_computed(spark):
    """Series 1,9,1,9,1,9 (median 5): perfect alternation → R=6,
    n1=n2=3, μ=4, σ²=2·3·3·12/(36·5)=1.2 → z=(6−4)/√1.2≈1.825742."""
    from pipelines_rj_sms_spark.quality.stats import runs_test
    df = spark.createDataFrame(
        [(t, v) for t, v in enumerate([1, 9, 1, 9, 1, 9])], ["t", "u"])
    out = runs_test(df, "t", "u").collect()[0]
    assert out["n_above"] == 3 and out["n_below"] == 3
    assert out["runs"] == 6 and out["expected_runs"] == 4.0
    assert out["z"] == 1.825742


def test_runs_test_median_values_dropped(spark):
    """Values equal to the median never count to either side."""
    from pipelines_rj_sms_spark.quality.stats import runs_test
    df = spark.createDataFrame(
        [(t, v) for t, v in enumerate([1, 5, 5, 5, 9])], ["t", "u"])
    out = runs_test(df, "t", "u").collect()[0]
    assert out["n_above"] == 1 and out["n_below"] == 1
    assert out["runs"] == 2


def test_mantel_haenszel_single_stratum_equals_plain_or(spark):
    """One stratum: OR_MH = ad/bc. a=30,b=10,c=20,d=40 → OR=6.0;
    E=(40·50)/100=20, V=40·60·50·50/(100²·99)=6.0606… →
    chi2=(30−20)²/V."""
    from pipelines_rj_sms_spark.quality.stats import mantel_haenszel
    rows = ([("s", True, True)] * 30 + [("s", True, False)] * 10
            + [("s", False, True)] * 20 + [("s", False, False)] * 40)
    df = spark.createDataFrame(rows, ["k", "ex", "oc"])
    out = mantel_haenszel(df, "k", "ex", "oc").collect()[0]
    assert out["n_strata"] == 1
    assert out["observed_exposed_cases"] == 30
    assert out["or_mh"] == 6.0
    v = 40 * 60 * 50 * 50 / (100 * 100 * 99)
    assert abs(out["chi2_mh"] - 100 / v) < 1e-3


def test_mantel_haenszel_null_association_pools_to_one(spark):
    """Two strata with OR=1 inside each (independent margins) →
    OR_MH = 1 even when crude pooling would confound."""
    from pipelines_rj_sms_spark.quality.stats import mantel_haenszel
    rows = []
    # stratum A: 50% exposed, 80% outcome, independent
    for ex in (True, False):
        rows += [("A", ex, True)] * 8 + [("A", ex, False)] * 2
    # stratum B: independent again, different margins
    for ex in (True, False):
        rows += [("B", ex, True)] * 2 + [("B", ex, False)] * 8
    df = spark.createDataFrame(rows, ["k", "ex", "oc"])
    out = mantel_haenszel(df, "k", "ex", "oc").collect()[0]
    assert out["or_mh"] == 1.0 and out["chi2_mh"] == 0.0


def test_cohens_kappa_textbook_2x2(spark):
    """Classic 2×2: diag=45+15=60 of N=100, rows (50,50) cols (55,45)
    → po=0.6, pe=(50·55+50·45)/10000=0.5, κ=(0.6−0.5)/0.5=0.2."""
    from pipelines_rj_sms_spark.quality.stats import cohens_kappa
    rows = ([("y", "y")] * 45 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 40)
    df = spark.createDataFrame(rows, ["a", "b"])
    out = cohens_kappa(df, "a", "b").collect()[0]
    assert out["n"] == 100 and out["observed_agree"] == 85
    # recompute: diag=85, S=50*55+50*45=5000 → po=.85, pe=.5, κ=.7
    assert out["po"] == 0.85 and out["pe"] == 0.5
    assert out["kappa"] == 0.7


def test_cohens_kappa_perfect_and_degenerate(spark):
    from pipelines_rj_sms_spark.quality.stats import cohens_kappa
    perfect = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 7, ["a", "b"])
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0
    degen = spark.createDataFrame([("x", "x")] * 5, ["a", "b"])
    assert cohens_kappa(degen, "a", "b").collect()[0]["kappa"] is None


def test_cochran_armitage_hand_computed(spark):
    """(n,a) = (10,1),(10,5),(10,9) at scores 1,2,3: T·N=240,
    V-term=135000 → z = 240/√4500 = 3.577709; a flat gradient → 0."""
    from pipelines_rj_sms_spark.quality.stats import cochran_armitage
    rows = []
    for w, a in ((1, 1), (2, 5), (3, 9)):
        rows += [(w, True)] * a + [(w, False)] * (10 - a)
    df = spark.createDataFrame(rows, ["w", "s"])
    out = cochran_armitage(df, "w", "s").collect()[0]
    assert out["n"] == 30 and out["successes"] == 15
    assert out["t_scaled"] == 8.0
    assert out["z_ca"] == 3.577709
    flat = []
    for w in (1, 2, 3):
        flat += [(w, True)] * 4 + [(w, False)] * 6
    z0 = cochran_armitage(
        spark.createDataFrame(flat, ["w", "s"]), "w", "s").collect()[0]
    assert z0["z_ca"] == 0.0


def test_cochran_armitage_degenerate_null(spark):
    """All successes (A=N) → zero variance → NULL z."""
    from pipelines_rj_sms_spark.quality.stats import cochran_armitage
    df = spark.createDataFrame(
        [(1, True)] * 5 + [(2, True)] * 5, ["w", "s"])
    assert cochran_armitage(df, "w", "s").collect()[0]["z_ca"] is None


def test_pettitt_finds_planted_level_shift(spark):
    """5 low then 5 high values: K2 peaks at the boundary (t=4),
    K = 12.5, p = 2·exp(−6K²/(n³+n²))."""
    import math
    from pipelines_rj_sms_spark.quality.stats import pettitt_test
    rows = [(t, 1) for t in range(5)] + [(t, 9) for t in range(5, 10)]
    df = spark.createDataFrame(rows, ["t", "u"])
    out = pettitt_test(df, "t", "u").collect()[0]
    assert out["n"] == 10 and out["change_t"] == 4
    assert out["k_stat"] == 12.5
    assert out["p_value"] == round(
        min(1.0, 2.0 * math.exp(-6.0 * 12.5 * 12.5 / (1000 + 100))), 6)


def test_pettitt_flat_series_k_zero_p_capped(spark):
    """A constant series has U_t ≡ 0 → K = 0, p capped at 1."""
    from pipelines_rj_sms_spark.quality.stats import pettitt_test
    df = spark.createDataFrame([(t, 7) for t in range(8)], ["t", "u"])
    out = pettitt_test(df, "t", "u").collect()[0]
    assert out["k_stat"] == 0.0 and out["p_value"] == 1.0


def test_uncertainty_coefficient_determined_and_independent(spark):
    """Y a deterministic function of X → U(Y|X)=1; independent
    uniform grid → MI=0, U=0."""
    from pipelines_rj_sms_spark.quality.stats import (
        uncertainty_coefficient)
    det = spark.createDataFrame(
        [("a", "A")] * 4 + [("b", "B")] * 4 + [("c", "A")] * 4,
        ["x", "y"])
    out = uncertainty_coefficient(det, "x", "y").collect()[0]
    assert out["u_y_given_x"] == 1.0
    assert out["u_x_given_y"] < 1.0        # X not recoverable from Y
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "AB" for _ in range(3)],
        ["x", "y"])
    o2 = uncertainty_coefficient(ind, "x", "y").collect()[0]
    # the 1e-6 pin grid breaks the exact ln identities MI=0 rests on
    # (pin(ln 6) != pin(ln 2) + pin(ln 3)); exact to grid precision
    assert abs(o2["mi"]) <= 2e-6 and abs(o2["u_y_given_x"]) <= 3e-6


def test_uncertainty_coefficient_constant_column_null(spark):
    from pipelines_rj_sms_spark.quality.stats import (
        uncertainty_coefficient)
    df = spark.createDataFrame([("a", "Z")] * 5 + [("b", "Z")] * 5,
                               ["x", "y"])
    out = uncertainty_coefficient(df, "x", "y").collect()[0]
    assert out["h_y"] == 0.0 and out["u_y_given_x"] is None


def test_welch_bh_planted_shift_detected_with_fdr(spark):
    """Group 'hot' sits far from the rest → p_adj 0, rejected. (The
    other groups also reject here — vs-REST semantics: their
    complement contains 'hot', so they genuinely differ from it.)
    A separate all-null panel must produce no rejections."""
    import random
    from pipelines_rj_sms_spark.quality.stats import welch_vs_rest_bh
    rng = random.Random(5)
    rows = []
    for g in "abcd":
        rows += [(g, rng.randrange(90, 110)) for _ in range(200)]
    rows += [("hot", rng.randrange(190, 210)) for _ in range(200)]
    df = spark.createDataFrame(rows, ["k", "u"])
    out = {r["key"]: r for r in
           welch_vs_rest_bh(df, "k", "u").collect()}
    assert out["hot"]["reject"] is True
    assert out["hot"]["p_adj"] == 0.0       # |z| enormous
    assert out["hot"]["z"] > 0
    null_rows = []
    for g in "abcd":
        null_rows += [(g, rng.randrange(0, 1000)) for _ in range(300)]
    null_out = welch_vs_rest_bh(
        spark.createDataFrame(null_rows, ["k", "u"]), "k", "u").collect()
    assert not any(r["reject"] for r in null_out)


def test_bh_adjustment_monotonicity(spark):
    """p_adj is non-decreasing in p_raw rank and ≥ p_raw."""
    import random
    from pipelines_rj_sms_spark.quality.stats import welch_vs_rest_bh
    rng = random.Random(9)
    rows = [(str(g), rng.randrange(0, 1000))
            for g in range(8) for _ in range(50)]
    df = spark.createDataFrame(rows, ["k", "u"])
    out = sorted(welch_vs_rest_bh(df, "k", "u").collect(),
                 key=lambda r: (r["p_raw"], r["key"]))
    adjs = [r["p_adj"] for r in out]
    assert adjs == sorted(adjs)
    assert all(r["p_adj"] >= r["p_raw"] - 1e-9 for r in out)


def test_partial_correlation_removes_common_driver(spark):
    """x and y both equal z plus independent noise: r_xy is strong,
    but controlling z it collapses toward 0."""
    import random
    from pipelines_rj_sms_spark.quality.stats import partial_correlation
    rng = random.Random(13)
    rows = []
    for _ in range(2000):
        z = rng.randrange(0, 1000)
        rows.append((z + rng.randrange(0, 200),
                     z + rng.randrange(0, 200), z))
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    out = partial_correlation(df, "x", "y", "z").collect()[0]
    assert out["r_xy"] > 0.85
    assert abs(out["r_xy_z"]) < 0.1


def test_partial_correlation_degenerate_controls(spark):
    """Constant z → r_xz undefined → NULL partial; constant x →
    NULL r_xy too."""
    from pipelines_rj_sms_spark.quality.stats import partial_correlation
    df = spark.createDataFrame(
        [(i, 2 * i, 7) for i in range(10)], ["x", "y", "z"])
    out = partial_correlation(df, "x", "y", "z").collect()[0]
    assert out["r_xy"] == 1.0 and out["r_xz"] is None
    assert out["r_xy_z"] is None


def test_kruskal_wallis_textbook_no_ties(spark):
    """Three groups {1,2,3},{4,5,6},{7,8,9}: ranks are 1..9, rank sums
    6/15/24, H = 12/90*(12+75+192) - 30 = 7.2 exactly (no ties)."""
    from pipelines_rj_sms_spark.quality.stats import kruskal_wallis
    rows = [("a", 1), ("a", 2), ("a", 3),
            ("b", 4), ("b", 5), ("b", 6),
            ("c", 7), ("c", 8), ("c", 9)]
    out = kruskal_wallis(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v").collect()[0]
    assert out["n_total"] == 9 and out["k_groups"] == 3
    assert out["df"] == 2
    assert out["h_stat"] == 7.2
    assert abs(out["epsilon_sq"] - (7.2 - 3 + 1) / 6) < 1e-6


def test_kruskal_wallis_all_tied_null(spark):
    """Every value identical: the tie correction divides out the whole
    statistic (C = 0) -> NULL h_stat rather than 0/0."""
    from pipelines_rj_sms_spark.quality.stats import kruskal_wallis
    rows = [("a", 5)] * 4 + [("b", 5)] * 4
    out = kruskal_wallis(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v").collect()[0]
    assert out["h_stat"] is None


def test_kruskal_wallis_two_groups_matches_mann_whitney(spark):
    """With k = 2 the tie-corrected H equals the (tie-corrected)
    Mann-Whitney z squared — the standard identity; pins the rank and
    tie arithmetic against the independently-coded MW operator."""
    import random
    from pipelines_rj_sms_spark.quality.stats import (kruskal_wallis,
                                                      mann_whitney_u)
    rng = random.Random(7)
    rows = [("a", rng.randrange(0, 40)) for _ in range(120)] + \
           [("b", rng.randrange(5, 45)) for _ in range(90)]
    df = spark.createDataFrame(rows, ["g", "v"])
    h = kruskal_wallis(df, "g", "v").collect()[0]["h_stat"]
    z = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]["z_stat"]
    assert abs(h - z * z) < 1e-3


def test_durbin_watson_numpy_cross_check(spark):
    """DW on a fixed series matches an independent numpy residual
    computation; a perfectly linear series has zero residuals and a
    NULL (0/0) statistic."""
    import random
    import numpy as np
    from pipelines_rj_sms_spark.quality.stats import durbin_watson
    rng = random.Random(11)
    ys = [100 + 3 * t + rng.randrange(-20, 21) for t in range(200)]
    df = spark.createDataFrame(list(enumerate(ys)), ["t", "y"])
    out = durbin_watson(df, "t", "y").collect()[0]
    t = np.arange(200.0)
    yv = np.array(ys, dtype=float)
    b, a = np.polyfit(t, yv, 1)
    e = yv - (a + b * t)
    dw = np.sum(np.diff(e) ** 2) / np.sum(e ** 2)
    assert abs(out["dw"] - dw) < 1e-4
    assert abs(out["slope"] - b) < 1e-6
    lin = spark.createDataFrame(
        [(t, 7 + 2 * t) for t in range(50)], ["t", "y"])
    assert durbin_watson(lin, "t", "y").collect()[0]["dw"] is None


def test_jarque_bera_numpy_cross_check(spark):
    """Skewness/kurtosis/JB match numpy population moments on a fixed
    skewed sample; a symmetric sample has (rounded) zero skew."""
    import random
    import numpy as np
    from pipelines_rj_sms_spark.quality.stats import jarque_bera
    rng = random.Random(3)
    vals = [rng.randrange(0, 50) ** 2 for _ in range(500)]
    out = jarque_bera(
        spark.createDataFrame([(v,) for v in vals], ["u"]),
        "u").collect()[0]
    x = np.array(vals, dtype=float)
    z = (x - x.mean()) / x.std()
    g1 = (z ** 3).mean() / (z ** 2).mean() ** 1.5
    g2 = (z ** 4).mean() / (z ** 2).mean() ** 2
    jb = 500 * (g1 ** 2 / 6 + (g2 - 3) ** 2 / 24)
    assert abs(out["skewness"] - g1) < 1e-4
    assert abs(out["kurtosis"] - g2) < 1e-4
    assert abs(out["jb_stat"] - jb) < max(1e-3, abs(jb) * 1e-4)
    sym = spark.createDataFrame(
        [(v,) for v in (-2, -1, -1, 0, 0, 0, 1, 1, 2)], ["u"])
    assert jarque_bera(sym, "u").collect()[0]["skewness"] == 0.0


def test_grubbs_hand_computed(spark):
    """[0,0,0,10]: mean 2.5, sample s = sqrt((4*100-100)/(4*3)) =
    5.0, G = 7.5/5 = 1.5 with the extreme value reported."""
    from pipelines_rj_sms_spark.quality.stats import grubbs_statistic
    df = spark.createDataFrame([(0,), (0,), (0,), (10,)], ["u"])
    out = grubbs_statistic(df, "u").collect()[0]
    assert out["mean"] == 2.5 and out["stddev"] == 5.0
    assert out["g_stat"] == 1.5
    assert out["extreme_value"] == 10.0


def test_friedman_textbook_no_ties(spark):
    """Two blocks, three treatments, identical orderings: classic
    Friedman chi2 = 12/(nk(k+1))*sum(Rj^2) - 3n(k+1) = 4, and
    Conover's tie-corrected T equals it when there are no ties."""
    from pipelines_rj_sms_spark.quality.stats import friedman_test
    rows = [("b1", "t1", 1), ("b1", "t2", 5), ("b1", "t3", 9),
            ("b2", "t1", 2), ("b2", "t2", 6), ("b2", "t3", 8)]
    out = friedman_test(
        spark.createDataFrame(rows, ["blk", "trt", "v"]),
        "blk", "trt", "v").collect()[0]
    assert out["n_blocks"] == 2 and out["k_treatments"] == 3
    assert out["df"] == 2
    assert out["statistic"] == 4.0


def test_friedman_all_tied_null(spark):
    """Every block fully tied: denominator 0 -> NULL statistic."""
    from pipelines_rj_sms_spark.quality.stats import friedman_test
    rows = [(b, t, 7) for b in ("b1", "b2") for t in ("x", "y")]
    out = friedman_test(
        spark.createDataFrame(rows, ["blk", "trt", "v"]),
        "blk", "trt", "v").collect()[0]
    assert out["statistic"] is None


def test_hellinger_identical_and_disjoint(spark):
    """Identical distributions: BC = 1, H = 0. Disjoint supports:
    BC = 0, H = 1, B-distance NULL (ln 0 guarded)."""
    from pipelines_rj_sms_spark.quality.stats import hellinger_distance
    same = spark.createDataFrame(
        [("a", 10.0), ("b", 10.0), ("a", 60.0), ("b", 60.0)],
        ["g", "v"])
    out = hellinger_distance(same, "g", "v", "a", "b",
                             lo=0.0, hi=100.0, n_bins=10).collect()[0]
    assert out["bhattacharyya"] == 1.0 and out["hellinger"] == 0.0
    assert out["b_distance"] == 0.0
    disj = spark.createDataFrame(
        [("a", 10.0), ("a", 15.0), ("b", 90.0)], ["g", "v"])
    out2 = hellinger_distance(disj, "g", "v", "a", "b",
                              lo=0.0, hi=100.0, n_bins=10).collect()[0]
    assert out2["bhattacharyya"] == 0.0 and out2["hellinger"] == 1.0
    assert out2["b_distance"] is None


def test_cohens_d_hand_computed(spark):
    """Groups {2,4} and {1,3} with variances 2: s_pooled = sqrt(2),
    d = 1/sqrt(2), g = d*(1 - 3/(4*4-9)) = d*4/7."""
    import math
    from pipelines_rj_sms_spark.quality.stats import cohens_d
    rows = [("a", 2), ("a", 4), ("b", 1), ("b", 3)]
    out = cohens_d(spark.createDataFrame(rows, ["g", "u"]),
                   "g", "u", "a", "b").collect()[0]
    assert out["mean_a"] == 3.0 and out["mean_b"] == 2.0
    assert abs(out["cohens_d"] - 1 / math.sqrt(2)) < 1e-6
    assert abs(out["hedges_g"]
               - (1 / math.sqrt(2)) * (1 - 3 / 7)) < 1e-6


def test_cramer_von_mises_identical_and_shifted(spark):
    """Identical samples: T = 0 exactly. A hand-checkable 2x2 case:
    a = {1, 2}, b = {3, 4} -> gaps 0.5, 1.0, 0.5 with weight 1 each,
    T = (4/16) * (0.25 + 1 + 0.25) = 0.375."""
    from pipelines_rj_sms_spark.quality.stats import cramer_von_mises
    same = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)],
        ["g", "v"])
    out = cramer_von_mises(same, "g", "v", "a", "b").collect()[0]
    assert out["t_stat"] == 0.0
    shift = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], ["g", "v"])
    out2 = cramer_von_mises(shift, "g", "v", "a", "b").collect()[0]
    assert abs(out2["t_stat"] - 0.375) < 1e-6


def test_eb_shrinkage_pulls_small_samples(spark):
    """A 1/1 key shrinks far below 1.0 and toward the prior mean; a
    500-trial key barely moves; degenerate variance passes raw rates
    through with NULL alpha/beta."""
    from pipelines_rj_sms_spark.quality.stats import eb_shrunk_rates
    rows = [("tiny", 1, 1), ("big", 150, 500), ("mid1", 30, 100),
            ("mid2", 20, 100), ("mid3", 25, 100), ("mid4", 35, 100)]
    df = spark.createDataFrame(rows, ["k", "hits", "trials"])
    out = {r["k"]: r for r in
           eb_shrunk_rates(df, ["k"], "hits", "trials").collect()}
    assert out["tiny"]["raw_rate"] == 1.0
    assert out["tiny"]["shrunk_rate"] < 0.75
    assert abs(out["big"]["shrunk_rate"] - 0.3) < 0.02
    assert out["tiny"]["alpha"] is not None
    const = spark.createDataFrame(
        [("x", 1, 2), ("y", 2, 4)], ["k", "hits", "trials"])
    co = {r["k"]: r for r in
          eb_shrunk_rates(const, ["k"], "hits", "trials").collect()}
    assert co["x"]["alpha"] is None
    assert co["x"]["shrunk_rate"] == 0.5


def test_wasserstein_point_masses(spark):
    """Point mass at 0 vs point mass at 5: W1 = 5 exactly; identical
    distributions give 0."""
    from pipelines_rj_sms_spark.quality.stats import wasserstein_1d
    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 5), ("b", 5)], ["g", "v"])
    out = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert out["w1_distance"] == 5.0
    same = spark.createDataFrame(
        [("a", 1), ("b", 1), ("a", 9), ("b", 9)], ["g", "v"])
    assert wasserstein_1d(
        same, "g", "v", "a", "b").collect()[0]["w1_distance"] == 0.0


def test_cuped_removes_preperiod_imbalance(spark):
    """post = pre + arm-independent noise: after CUPED both arms'
    adjusted means coincide (kappa = 1 when y = x + c per arm
    structure is pure pre-driven); zero pre-variance passes raw."""
    from pipelines_rj_sms_spark.quality.stats import (
        cuped_adjusted_means)
    rows = []
    # arm 0 users happen to have high pre; arm 1 low pre; post = pre+10
    for i in range(50):
        rows.append((0, 100 + i, 110 + i))
        rows.append((1, i, 10 + i))
    df = spark.createDataFrame(rows, ["arm", "pre", "post"])
    out = {r["grp"]: r for r in
           cuped_adjusted_means(df, "arm", "pre", "post").collect()}
    assert abs(out[0]["kappa"] - 1.0) < 1e-9
    assert abs(out[0]["adjusted_mean"] - out[1]["adjusted_mean"]) < 1e-6
    assert abs(out[0]["mean_post"] - out[1]["mean_post"] - 100) < 1e-6
    flat = spark.createDataFrame(
        [(0, 5, 7), (1, 5, 9)], ["arm", "pre", "post"])
    fo = {r["grp"]: r for r in
          cuped_adjusted_means(flat, "arm", "pre", "post").collect()}
    assert fo[0]["kappa"] is None
    assert fo[0]["adjusted_mean"] == fo[0]["mean_post"]


def test_did_parallel_trends_null_and_effect(spark):
    """Control moves +10, treated moves +10+5: DiD = 5 exactly; with
    identical movements DiD = 0."""
    import random
    from pipelines_rj_sms_spark.quality.stats import diff_in_diff
    rng = random.Random(23)
    rows = []
    for _ in range(300):
        noise = rng.randrange(0, 7)
        rows += [("c", "pre", 100 + noise), ("c", "post", 110 + noise),
                 ("t", "pre", 200 + noise),
                 ("t", "post", 215 + noise)]
    df = spark.createDataFrame(rows, ["g", "p", "u"])
    out = diff_in_diff(df, "g", "p", "u", treat="t", control="c",
                       pre="pre", post="post").collect()[0]
    assert abs(out["did"] - 5.0) < 1e-6
    assert out["z_stat"] is not None and out["z_stat"] > 3
    null_df = df.select("g", "p",
                        (F.col("u") % 100).alias("u"))
    out2 = diff_in_diff(null_df, "g", "p", "u", treat="t",
                        control="c", pre="pre",
                        post="post").collect()[0]
    assert abs(out2["did"] - 5.0) < 1.0  # residual effect only


def test_breusch_pagan_detects_trending_variance(spark):
    """Noise amplitude growing with t: BP is large; constant-variance
    noise keeps n*R² small. Cross-checked against a numpy replay of
    the same statistic."""
    import random
    import numpy as np
    from pipelines_rj_sms_spark.quality.stats import breusch_pagan
    rng = random.Random(31)
    ys = [1000 + 2 * t + rng.randrange(-t - 1, t + 2)
          for t in range(300)]
    df = spark.createDataFrame(list(enumerate(ys)), ["t", "c"])
    out = breusch_pagan(df, "t", "c").collect()[0]
    t = np.arange(300.0)
    y = np.array(ys, dtype=float)
    b, a = np.polyfit(t, y, 1)
    g = (y - (a + b * t)) ** 2
    r = np.corrcoef(t, g)[0, 1] ** 2
    assert abs(out["r_squared"] - r) < 1e-3
    assert abs(out["bp_stat"] - 300 * r) < 0.5


def test_gesd_unmasks_adjacent_outliers(spark):
    """Two planted spikes mask each other for a single Grubbs pass
    but GESD removes them in order (largest first), and round-3's
    statistic drops sharply once both are gone."""
    from pipelines_rj_sms_spark.quality.stats import gesd_outliers
    vals = [100 + (i % 5) for i in range(40)] + [500, 480]
    df = spark.createDataFrame(list(enumerate(vals)), ["t", "u"])
    out = {r["round"]: r for r in
           gesd_outliers(df, "t", "u", k=3).collect()}
    assert out[1]["value_removed"] == 500
    assert out[2]["value_removed"] == 480
    assert out[2]["r_stat"] > 3 and out[3]["r_stat"] < 3
    tiny = spark.createDataFrame([(0, 5), (1, 5)], ["t", "u"])
    assert gesd_outliers(tiny, "t", "u", k=2).collect() == []


def test_brown_forsythe_unequal_spread_detected(spark):
    """Same centers, one group 10x the spread: W (the deviation
    ANOVA F) is large; identical spreads give F near 0."""
    import random
    from pipelines_rj_sms_spark.quality.stats import brown_forsythe
    rng = random.Random(41)
    rows = ([("tight", 100 + rng.randrange(-2, 3)) for _ in range(300)]
            + [("wide", 100 + rng.randrange(-40, 41))
               for _ in range(300)])
    out = brown_forsythe(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v").collect()[0]
    assert out["f_stat"] > 50
    same = ([("a", 100 + rng.randrange(-5, 6)) for _ in range(300)]
            + [("b", 200 + rng.randrange(-5, 6)) for _ in range(300)])
    out2 = brown_forsythe(
        spark.createDataFrame(same, ["g", "v"]), "g", "v").collect()[0]
    assert out2["f_stat"] < 5


def test_mcnemar_hand_cells(spark):
    """Constructed paired predictions: b=3, c=1 -> chi2 = 4/4 = 1."""
    from pyspark.sql import functions as F
    from pipelines_rj_sms_spark.quality.stats import mcnemar_test
    rows = ([(1, 1, 1)] * 5 + [(0, 0, 1)] * 2
            + [(1, 0, 1)] * 3 + [(0, 1, 1)] * 1)
    df = spark.createDataFrame(rows, ["a", "b", "y"])
    out = mcnemar_test(df, F.col("a") == 1, F.col("b") == 1,
                       F.col("y") == 1).collect()[0]
    assert (out["both_right"], out["both_wrong"]) == (5, 2)
    assert (out["only_a"], out["only_b"]) == (3, 1)
    assert out["chi2"] == 1.0


def test_mood_median_shifted_group_detected(spark):
    """One group sits mostly above the global median: chi2 is large;
    identically-distributed groups give a small statistic."""
    import random
    from pipelines_rj_sms_spark.quality.stats import mood_median_test
    rng = random.Random(61)
    rows = ([("lo", rng.randrange(0, 100)) for _ in range(300)]
            + [("hi", rng.randrange(80, 180)) for _ in range(300)])
    out = mood_median_test(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v").collect()[0]
    assert out["chi2"] > 100
    same = [("ab"[i % 2], rng.randrange(0, 100)) for i in range(600)]
    out2 = mood_median_test(
        spark.createDataFrame(same, ["g", "v"]), "g", "v").collect()[0]
    assert out2["chi2"] < 10
