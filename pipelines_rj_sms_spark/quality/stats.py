"""Statistical release gates: two-sample comparison and digit-law audit.

The reference's quality surface is threshold checks (count deltas,
freshness); a data platform also needs the *statistical* gates: "did
this metric actually move between cohorts?" (A/B experiment readout,
pre/post deploy comparison) and "does this numeric column look
fabricated/corrupted?" (Benford's-law screening — the classic audit
test for invoice/price columns, public method).

Both are single hash aggregations over the fact table — group moments
for Welch, a 9-row digit histogram for Benford — so they run at any
scale for the cost of one scan; no sorts, no windows over the data.

Cross-engine determinism: every derived float is rounded to 6 decimals;
Benford's first digit is taken from the INTEGER fixed-point rendering of
the value (floor(x*100+0.5) as BIGINT, then the first character of the
integer's decimal string) — never floor(log10(x)), whose libm rounding
can disagree between engines at exact powers of ten.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.numeric import DET_SCALE, det_units

__all__ = ["welch_t_test", "benford_first_digit",
           "two_proportion_test"]


def welch_t_test(df: DataFrame, group_col: str, value_col: str,
                 group_a, group_b) -> DataFrame:
    """Welch's unequal-variance t statistic between two groups.

    One row: (n_a, n_b, mean_a, mean_b, t_stat, deg_freedom) with the
    Welch–Satterthwaite degrees of freedom. One hash aggregation over
    the two groups' rows (conditional aggregates — the table is scanned
    once, not once per group); the arithmetic is textbook:

        t  = (m_a - m_b) / sqrt(s²_a/n_a + s²_b/n_b)
        df = (s²_a/n_a + s²_b/n_b)² /
             ((s²_a/n_a)²/(n_a-1) + (s²_b/n_b)²/(n_b-1))

    Moments are computed from det-quantized Σx and Σx² (closed-form
    sample variance), NOT avg/var_samp: streaming-moment aggregates
    accumulate doubles whose combine order moves the last ulp, and a
    6dp-rounded statistic can land a boundary differently run-to-run
    or engine-to-engine (functions/numeric.py).
    """
    from pipelines_rj_sms_spark.functions.numeric import (det_sum,
                                                          det_sum_big)
    v = F.col(value_col)
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    agg = df.filter(in_a | in_b).agg(
        F.count(F.when(in_a, v)).alias("n_a"),
        F.count(F.when(in_b, v)).alias("n_b"),
        det_sum(F.when(in_a, v)).alias("_sa"),
        det_sum(F.when(in_b, v)).alias("_sb"),
        det_sum_big(F.when(in_a, v * v)).alias("_qa"),
        det_sum_big(F.when(in_b, v * v)).alias("_qb"))
    agg = agg.select(
        "n_a", "n_b",
        (F.col("_sa") / F.col("n_a")).alias("_ma"),
        (F.col("_sb") / F.col("n_b")).alias("_mb"),
        ((F.col("_qa") - F.col("_sa") * F.col("_sa") / F.col("n_a"))
         / (F.col("n_a") - 1)).alias("_va"),
        ((F.col("_qb") - F.col("_sb") * F.col("_sb") / F.col("n_b"))
         / (F.col("n_b") - 1)).alias("_vb"))
    sea = F.col("_va") / F.col("n_a")
    seb = F.col("_vb") / F.col("n_b")
    t = (F.col("_ma") - F.col("_mb")) / F.sqrt(sea + seb)
    dof = (F.pow(sea + seb, 2)
           / (F.pow(sea, 2) / (F.col("n_a") - 1)
              + F.pow(seb, 2) / (F.col("n_b") - 1)))
    return agg.select(
        "n_a", "n_b",
        F.round("_ma", 6).alias("mean_a"),
        F.round("_mb", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("deg_freedom"))


def benford_first_digit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law.

    Returns 9 rows (first_digit, n, observed_share, expected_share,
    chi2_term) where ``expected_share = log10(1 + 1/d)`` and
    ``chi2_term = (n - e)²/e`` with ``e = N * expected_share`` — sum the
    column for the chi-square statistic (8 degrees of freedom). Only
    strictly positive values participate.

    The digit comes from the fixed-point BIGINT rendering (integer
    hundredths), so both engines extract it with exact integer/string
    arithmetic. Expected shares are Python-computed literals — identical
    bytes in both plans.
    """
    units = F.floor(F.col(value_col) * 100 + 0.5).cast("bigint")
    digits = (df.filter(F.col(value_col) > 0)
              .select(F.substring(units.cast("string"), 1, 1)
                      .cast("int").alias("first_digit"))
              .groupBy("first_digit").agg(F.count("*").alias("n")))
    total = F.broadcast(digits.agg(
        F.sum("n").cast("double").alias("_t")))
    expected = F.create_map(*[
        F.lit(x) for d in range(1, 10)
        for x in (d, round(math.log10(1.0 + 1.0 / d), 12))])
    return (digits.crossJoin(total)
            .withColumn("_e", expected[F.col("first_digit")] * F.col("_t"))
            .select(
                "first_digit", "n",
                F.round(F.col("n") / F.col("_t"), 6)
                .alias("observed_share"),
                F.round(expected[F.col("first_digit")], 6)
                .alias("expected_share"),
                F.round(F.pow(F.col("n") - F.col("_e"), 2) / F.col("_e"), 6)
                .alias("chi2_term")))


def two_proportion_test(df: DataFrame, group_col: str, success_col,
                        group_a, group_b) -> DataFrame:
    """Two-proportion z-test (pooled standard error, textbook): the
    conversion-rate companion to :func:`welch_t_test` — n, successes,
    and rate per group, plus z = (p_a - p_b) / sqrt(p̂(1-p̂)(1/n_a+1/n_b))
    with p̂ the pooled rate. One conditional hash aggregation; pass
    ``success_col`` as a boolean column/expression. Floats round to 6.
    """
    s = success_col if isinstance(success_col, Column) \
        else F.col(success_col)
    s = s.cast("int")
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    agg = df.filter(in_a | in_b).agg(
        F.count(F.when(in_a, F.lit(1))).alias("n_a"),
        F.count(F.when(in_b, F.lit(1))).alias("n_b"),
        F.sum(F.when(in_a, s).otherwise(F.lit(0))).alias("s_a"),
        F.sum(F.when(in_b, s).otherwise(F.lit(0))).alias("s_b"))
    pa = F.col("s_a") / F.col("n_a")
    pb = F.col("s_b") / F.col("n_b")
    pooled = (F.col("s_a") + F.col("s_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pooled * (1.0 - pooled)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return agg.select(
        "n_a", "n_b",
        F.col("s_a").cast("bigint").alias("successes_a"),
        F.col("s_b").cast("bigint").alias("successes_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(F.when(se > 0, (pa - pb) / se), 6).alias("z_stat"))


def population_stability_index(ref: DataFrame, cur: DataFrame,
                               value_col: str,
                               n_bins: int = 10,
                               approx_edges: bool = False) -> DataFrame:
    """PSI drift gate between a reference snapshot and a current one —
    the standard monitoring statistic for "did this feature's
    distribution move" (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted; credit-scoring folklore thresholds, public).

    Bin edges are the REFERENCE's exact quantiles (Spark `percentile`,
    sort-based exact — both engines use the same (n-1)p linear
    interpolation, so the oracle replays edges bit-exact). Exact
    percentile BUFFERS the column per aggregation — fine for the
    monitored samples PSI normally runs on, wrong for a raw
    billion-row column: pass ``approx_edges=True`` there
    (approx_percentile, bounded-memory sketch; PSI only needs edges
    that roughly decile the reference, so sketch error is immaterial —
    but the result is then not bit-replayable, hence opt-in). Both
    snapshots then bucket with one conditional-sum aggregation each —
    no join between the datasets, the only coordination is the
    broadcast edge row. PSI = sum over bins (p - q) * ln(p / q) with
    1e-6 floors so empty bins stay finite. Returns one row per bin
    (bin, ref_share, cur_share, psi_term) plus the total via
    `sum(psi_term) over ()` in column `psi_total` — one number,
    auditable per bin.
    """
    fracs = [i / n_bins for i in range(1, n_bins)]
    # edges round to 6 dp before bucketing: exact-percentile
    # interpolation can differ between engines in the LAST ULP, and a
    # data value equal to an edge would then flip buckets; rounded
    # edges make the binning engine-portable (the edges are arbitrary
    # boundaries — their 7th decimal carries no information)
    pct = (F.approx_percentile if approx_edges else F.percentile)
    edges = [round(float(x), 6) for x in ref.agg(
        pct(F.col(value_col), F.array(
            *[F.lit(f) for f in fracs]))).first()[0]]

    def bucket(c):
        b = F.lit(0)
        for i, e in enumerate(edges):
            b = F.when(F.col(c) > F.lit(e), F.lit(i + 1)).otherwise(b)
        return b

    def shares(df, out):
        return (df.filter(F.col(value_col).isNotNull())
                .groupBy(bucket(value_col).alias("bin"))
                .agg(F.count("*").alias("_n"))
                .select("bin", (F.col("_n") / F.sum("_n").over(
                    Window.partitionBy())).alias(out)))

    eps = 1e-6
    joined = (shares(ref, "ref_share")
              .join(shares(cur, "cur_share"), "bin", "full")
              .select(
                  "bin",
                  F.round(F.coalesce("ref_share", F.lit(0.0)), 6)
                  .alias("ref_share"),
                  F.round(F.coalesce("cur_share", F.lit(0.0)), 6)
                  .alias("cur_share")))
    p = F.greatest(F.col("ref_share"), F.lit(eps))
    q = F.greatest(F.col("cur_share"), F.lit(eps))
    term = (p - q) * F.log(p / q)
    # psi_total sums computed doubles across an unordered window —
    # quantize each term first (det_units) so the total is identical
    # under any row order (functions/numeric.py)
    return (joined
            .withColumn("psi_term", F.round(term, 6))
            .withColumn("psi_total",
                        F.round(F.sum(det_units(term))
                                .over(Window.partitionBy())
                                .cast("double") / float(DET_SCALE),
                                6))
            .orderBy("bin"))


def ks_two_sample(df: DataFrame, group_col: str, value_col: str,
                  group_a, group_b) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: D = max |F_a(x) − F_b(x)|
    over the observed support — the distribution-shape companion to
    :func:`welch_t_test` (which only sees moments) and the PSI gate
    (which needs binning; KS is binning-free).

    Scale shape: the data collapses to per-distinct-value counts for
    each group in ONE conditional hash aggregation; the ECDF cumsums
    run as DISTRIBUTED prefix sums over the collapsed value table
    (``global_cumsum`` — range-partitioned, no SinglePartition
    exchange, so a near-continuous value column whose support
    approaches data size still parallelizes). Exactness: the gap is
    held as the integer cross-product |cum_a·n_b − cum_b·n_a|
    (DECIMAL(38,0) — exact past 2**63), so the max and its location
    are exact; the single division to D and the one-term asymptotic
    p ≈ 2·exp(−2·m·D²) (m = harmonic sample size) happen once, on the
    driver-side scalar row. Returns one row: (n_a, n_b, d_numerator,
    ks_stat, at_value, p_approx).
    """
    from pipelines_rj_sms_spark.operators.ids import global_cumsum

    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    counts = (df.filter((in_a | in_b) & F.col(value_col).isNotNull())
              .groupBy(F.col(value_col).alias("_v"))
              .agg(F.sum(in_a.cast("long")).alias("_ca"),
                   F.sum(in_b.cast("long")).alias("_cb")))
    cc = global_cumsum(counts, ["_v"], ["_ca", "_cb"])
    d38 = "decimal(38,0)"
    # grand totals = last prefix sums (cum is monotone); the 1-row agg
    # rides back as a broadcast scalar frame
    tots = F.broadcast(cc.agg(
        F.max("_cum__ca").cast(d38).alias("_na"),
        F.max("_cum__cb").cast(d38).alias("_nb")))
    gap = F.abs(F.col("_cum__ca").cast(d38) * F.col("_nb")
                - F.col("_cum__cb").cast(d38) * F.col("_na"))
    # winner = largest gap, smallest value on ties (max over the
    # struct with the value negated) — deterministic
    best = F.max(F.struct(F.col("_gap").alias("g"),
                          (-F.col("_v")).alias("nv")))
    agg = (cc.crossJoin(tots)
           .select(F.col("_v"), gap.alias("_gap"),
                   F.col("_na"), F.col("_nb"))
           .agg(best.alias("_best"),
                F.max("_na").alias("_n_a"),
                F.max("_nb").alias("_n_b")))
    d = (F.col("_best.g").cast("double")
         / (F.col("_n_a") * F.col("_n_b")).cast("double"))
    m = ((F.col("_n_a") * F.col("_n_b")).cast("double")
         / (F.col("_n_a") + F.col("_n_b")).cast("double"))
    # pin_round6: ks_stat is an exact integer ratio (gap/(n_a*n_b))
    # — the .5e-6-tie class (functions/numeric.py)
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    from pipelines_rj_sms_spark.operators.cache import track
    return track(agg.select(
        F.col("_n_a").cast("bigint").alias("n_a"),
        F.col("_n_b").cast("bigint").alias("n_b"),
        F.col("_best.g").cast("bigint").alias("d_numerator"),
        pin_round6(d).alias("ks_stat"),
        (-F.col("_best.nv")).alias("at_value"),
        pin_round6(F.least(F.lit(1.0),
                           2.0 * F.exp(-2.0 * m * d * d)))
        .alias("p_approx")), cc)


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str,
                   group_a, group_b) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test with the normal
    approximation and tie correction — the nonparametric two-sample
    location test (Welch without the normality assumption; public
    formulas).

    Ranks use the same exact half-unit average-rank construction as
    ``quality/profile.spearman_correlation``: the combined sample
    collapses to per-value counts, the rank cumsum runs as a
    DISTRIBUTED prefix sum over the collapsed support
    (``global_cumsum`` — no SinglePartition exchange), and R_a
    accumulates as exact DECIMAL(38,0) integers (2·U is an integer
    even with .5 average ranks). The tie term Σ(t³−t) is exact the
    same way. Only z's final expression runs in doubles —
    engine-identical. One row: (n_a, n_b, u_a, u_b, z_stat), floats
    rounded to 6.
    """
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import global_cumsum

    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    counts = (df.filter((in_a | in_b) & F.col(value_col).isNotNull())
              .groupBy(F.col(value_col).alias("_v"))
              .agg(F.sum(in_a.cast("long")).alias("_ca"),
                   F.sum(in_b.cast("long")).alias("_cb"))
              .withColumn("_t", F.col("_ca") + F.col("_cb")))
    cc = global_cumsum(counts, ["_v"], ["_t"])
    # average rank of tied block in half-units: 2*cum - t + 1
    d38 = "decimal(38,0)"
    r2 = (2 * F.col("_cum__t") - F.col("_t") + 1).cast(d38)
    agg = (cc
           .select("_ca", "_cb", "_t", r2.alias("_r2"))
           .agg(F.sum("_ca").cast(d38).alias("_na"),
                F.sum("_cb").cast(d38).alias("_nb"),
                F.sum(F.col("_ca").cast(d38) * F.col("_r2"))
                .alias("_ra2"),
                F.sum(F.col("_t").cast(d38) * F.col("_t").cast(d38)
                      * F.col("_t").cast(d38)
                      - F.col("_t").cast(d38)).alias("_ties")))
    na, nb = F.col("_na"), F.col("_nb")
    n = na + nb
    # 2*U_a = 2*R_a - n_a(n_a+1); _ra2 is already 2*R_a
    u2_a = F.col("_ra2") - na * (na + 1)
    u2_b = 2 * na * nb - u2_a
    mu2 = (na * nb).cast("double")            # 2 * n_a n_b / 2
    tie_adj = (F.lit(1.0)
               - F.col("_ties").cast("double")
               / (n * (n + 1) * (n - 1)).cast("double"))
    sigma2 = F.sqrt((na * nb * (n + 1)).cast("double") / 3.0 * tie_adj)
    z = F.when(sigma2 > 0,
               (u2_a.cast("double") - mu2) / sigma2)
    # Cliff's delta (the rank effect size) is free from U:
    # delta = (U_a - U_b) / (n_a * n_b), an exact rational in 2U units
    delta = ((u2_a - u2_b).cast("double")
             / (2 * na * nb).cast("double"))
    return track(agg.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        (u2_a.cast("double") / 2.0).alias("u_a"),
        (u2_b.cast("double") / 2.0).alias("u_b"),
        F.round(z, 6).alias("z_stat"),
        F.round(delta, 6).alias("cliffs_delta")), cc)


def one_way_anova(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """One-way fixed-effects ANOVA across ALL groups — the k-group
    generalization of :func:`welch_t_test` (textbook decomposition,
    public): SST = Σ(x−x̄)², SSB = Σ n_g(x̄_g−x̄)², SSW = SST − SSB,

        F = (SSB / (k−1)) / (SSW / (N−k)),   eta² = SSB / SST

    (eta² is the effect size the raw F lacks — share of variance
    explained by the grouping.)

    One conditional hash aggregation collapses the data to per-group
    (n, Σx, Σx²) sufficient statistics — det-quantized fixed-point, so
    the moments are exact integers under any combine order
    (functions/numeric.py); group means never materialize per row. The
    k-row rollup then folds to one row: (n_rows, n_groups, f_stat,
    eta_sq, ss_between, ss_within), floats rounded to 6. Scale: the
    data is touched once; everything after is O(k).
    """
    from pipelines_rj_sms_spark.functions.numeric import (det_sum,
                                                          det_sum_big,
                                                          det_units)
    v = F.col(value_col)
    g = (df.filter(v.isNotNull() & F.col(group_col).isNotNull())
         .groupBy(group_col)
         .agg(F.count("*").alias("_n"),
              det_sum(v).alias("_s"),
              det_sum_big(v * v).alias("_q")))
    # SSB and SST from the k-row rollup: SST = ΣQ − S²/N,
    # SSB = Σ s_g²/n_g − S²/N. The per-group terms s_g²/n_g are
    # computed doubles summed across the rollup — det-quantize them
    # so the one-row output is order-independent.
    scale = 1_000_000
    agg = g.agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_groups"),
        (F.sum(det_units(F.col("_s") * F.col("_s") / F.col("_n"),
                         scale).cast("decimal(38,0)"))
         .cast("double") / F.lit(float(scale))).alias("_sb_term"),
        (F.sum(det_units(F.col("_q"), scale).cast("decimal(38,0)"))
         .cast("double") / F.lit(float(scale))).alias("_qt"),
        (F.sum(det_units(F.col("_s"), scale).cast("decimal(38,0)"))
         .cast("double") / F.lit(float(scale))).alias("_st"))
    grand = F.col("_st") * F.col("_st") / F.col("n_rows")
    ssb = F.col("_sb_term") - grand
    sst = F.col("_qt") - grand
    ssw = sst - ssb
    k1 = (F.col("n_groups") - 1).cast("double")
    nk = (F.col("n_rows") - F.col("n_groups")).cast("double")
    f_stat = F.when((ssw > 0) & (F.col("n_groups") > 1) & (nk > 0),
                    (ssb / k1) / (ssw / nk))
    eta = F.when(sst > 0, ssb / sst)
    return agg.select(
        "n_rows", "n_groups",
        F.round(f_stat, 6).alias("f_stat"),
        F.round(eta, 6).alias("eta_sq"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"))


# Poisson(1) cumulative probabilities e^{-1} Σ 1/i!, i = 0..8 — the
# inverse-CDF thresholds for the bootstrap resampling weights. Single
# source of truth: the oracle SQL is generated FROM this tuple, so the
# engine and DuckDB compare against bit-identical literals.
POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                0.9196986029286058, 0.9810118431238462,
                0.9963401531726563, 0.9994058151824183,
                0.9999167588507119, 0.9999897508033253,
                0.9999988747974021)


def poisson_bootstrap_mean_ci(df: DataFrame, value_col: str,
                              id_col: str, n_replicas: int = 100,
                              alpha: float = 0.05,
                              salt: str = "boot",
                              scale: int = 1000) -> DataFrame:
    """Percentile bootstrap confidence interval for the mean via the
    POISSON bootstrap — the distributed form of the bootstrap (public
    method: resampling counts per row are iid Poisson(1), so replicas
    need no global coordination, just a per-(row, replica) draw).

    The draws are replayable md5 hash-uniforms of (salt, id, replica)
    — same discipline as the sampling operators and the DP release —
    pushed through the exact Poisson(1) inverse CDF (thresholds
    ``POISSON1_CDF``, truncated at 9: P(>9) < 1.1e-7). Replica means
    are exact rationals (det-quantized value units, integer weight
    sums); the CI is the exact percentile pair over the B-row replica
    table — both engines interpolate (n−1)p identically.

    Scale shape: the replica explode is a narrow map (×B rows, no
    wide columns); the per-replica aggregation collapses map-side to
    B rows per partition before one tiny shuffle. Cost is B passes of
    expression arithmetic over the data — the bootstrap's intrinsic
    price; run it on the aggregate/sample of interest, not a raw
    100 TB fact table. One row: (n_rows, n_replicas, mean_obs,
    ci_lo, ci_hi).
    """
    from pipelines_rj_sms_spark.functions.numeric import det_units

    v_units = det_units(F.col(value_col), scale)
    base = (df.filter(F.col(value_col).isNotNull())
            .select(F.col(id_col).cast("string").alias("_id"),
                    v_units.alias("_u")))
    b = F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1)))
    rep = base.select("_id", "_u", b.alias("_b"))
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col("_id"), F.lit("|"),
                       F.col("_b").cast("string"))), 1, 8),
        16, 10).cast("long")
    u = ((h % 1048576) + 0.5) / 1048576.0
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    means = (rep.withColumn("_w", w)
             .groupBy("_b")
             .agg((F.sum(F.col("_w") * F.col("_u")).cast("double")
                   / F.sum("_w") / F.lit(float(scale))).alias("_m")))
    obs = F.broadcast(base.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (F.sum("_u").cast("double") / F.count("*")
         / F.lit(float(scale))).alias("_mean_obs")))
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ci = means.agg(
        F.count("*").cast("bigint").alias("n_replicas"),
        F.percentile(F.col("_m"), F.lit(lo)).alias("_lo"),
        F.percentile(F.col("_m"), F.lit(hi)).alias("_hi"))
    return (ci.crossJoin(obs)
            .select("n_rows", "n_replicas",
                    F.round("_mean_obs", 6).alias("mean_obs"),
                    F.round("_lo", 6).alias("ci_lo"),
                    F.round("_hi", 6).alias("ci_hi")))


def randomization_test_mean_diff(df: DataFrame, group_col: str,
                                 value_col: str, id_col: str,
                                 group_a, group_b,
                                 n_replicas: int = 200,
                                 salt: str = "perm",
                                 scale: int = 1000) -> DataFrame:
    """Approximate randomization (permutation) test for the difference
    of group means — the assumption-free significance companion to
    :func:`welch_t_test` (public method: under H0 labels are
    exchangeable, so re-draw them and count how often the shuffled
    |mean_a − mean_b| reaches the observed one).

    Labels are re-drawn iid with the observed group-a share (the
    binomial randomization variant — no global shuffle needed, which
    is what makes it distributed) from replayable md5 hash-uniforms of
    (salt, id, replica), the same draw discipline as the bootstrap and
    the sampling operators. Replicate mean-diffs are exact rationals
    (quantized units / integer counts); the p-value uses the add-one
    convention (1 + #{|diff_b| ≥ |diff_obs|}) / (B + 1) so it is never
    exactly zero. One row: (n_a, n_b, n_replicas, mean_diff_obs,
    p_value).

    Scale: ×B narrow explode, per-replica conditional sums collapse
    map-side to B rows; same intrinsic B-passes cost (and the same
    advice) as :func:`poisson_bootstrap_mean_ci`.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_units

    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    base = (df.filter((in_a | in_b) & F.col(value_col).isNotNull())
            .select(F.col(id_col).cast("string").alias("_id"),
                    in_a.alias("_is_a"),
                    det_units(F.col(value_col), scale).alias("_u")))
    obs = F.broadcast(base.agg(
        F.count(F.when(F.col("_is_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("_is_a"), 1)).alias("n_b"),
        F.sum(F.when(F.col("_is_a"), F.col("_u"))).alias("_sa"),
        F.sum(F.when(~F.col("_is_a"), F.col("_u"))).alias("_sb")))
    b = F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1)))
    rep = base.select("_id", "_u", b.alias("_b")).crossJoin(obs)
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col("_id"), F.lit("|"),
                       F.col("_b").cast("string"))), 1, 8),
        16, 10).cast("long")
    u = ((h % 1048576) + 0.5) / 1048576.0
    p_a = F.col("n_a") / (F.col("n_a") + F.col("n_b"))
    draw_a = u < p_a
    reps = (rep.groupBy("_b")
            .agg(F.sum(F.when(draw_a, F.col("_u"))).alias("_ra"),
                 F.count(F.when(draw_a, 1)).alias("_na"),
                 F.sum(F.when(~draw_a, F.col("_u"))).alias("_rb"),
                 F.count(F.when(~draw_a, 1)).alias("_nb"))
            .filter((F.col("_na") > 0) & (F.col("_nb") > 0)))
    diff_b = (F.col("_ra").cast("double") / F.col("_na")
              - F.col("_rb").cast("double") / F.col("_nb"))
    diff_obs = (F.col("_sa").cast("double") / F.col("n_a")
                - F.col("_sb").cast("double") / F.col("n_b"))
    hits = reps.crossJoin(obs).agg(
        F.count("*").alias("_kept"),
        F.sum((F.abs(diff_b) >= F.abs(diff_obs)).cast("long"))
        .alias("_ge"))
    return (hits.crossJoin(obs).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("_kept").cast("bigint").alias("n_replicas"),
        F.round(diff_obs / F.lit(float(scale)), 6)
        .alias("mean_diff_obs"),
        F.round((F.col("_ge") + 1).cast("double")
                / (F.col("_kept") + 1), 6).alias("p_value")))


def jensen_shannon_divergence(df: DataFrame, group_col: str,
                              value_col: str, group_a, group_b,
                              lo: float, hi: float,
                              n_bins: int = 20) -> DataFrame:
    """Jensen-Shannon divergence between two groups' value
    distributions over fixed equal-width bins — the SYMMETRIC, bounded
    ([0, ln 2]) companion to the PSI gate (PSI explodes on empty bins
    and is asymmetric; JSD is the standard choice for corpus-mix /
    train-vs-eval distribution comparison in data-pipeline QA — public
    formula):

        m = (p+q)/2
        JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m)    (0-mass terms are 0)

    Fixed [lo, hi) equal-width bins, outliers clamped to the edge
    bins — no quantile estimation, so the binning is trivially
    engine-portable. p and q are exact rationals (BIGINT bin count /
    BIGINT group total, one division each); each bin's term is a
    single fixed double expression, and the total accumulates
    det-quantized over the ≤n_bins collapsed rows — order-independent.

    Scale shape: ONE conditional hash aggregation over the facts to
    the (bin, count_a, count_b) rollup; totals are unbounded windows
    over those ≤n_bins rows. Returns one row per occupied bin
    (bin, share_a, share_b, jsd_term, jsd_total).
    """
    width = (float(hi) - float(lo)) / int(n_bins)
    raw_bin = F.floor((F.col(value_col) - F.lit(float(lo)))
                      / F.lit(width)).cast("int")
    bin_c = F.least(F.greatest(raw_bin, F.lit(0)),
                    F.lit(int(n_bins) - 1))
    base = (df.filter(F.col(value_col).isNotNull()
                      & F.col(group_col).isin(group_a, group_b))
            .groupBy(bin_c.alias("bin"))
            .agg(F.sum((F.col(group_col) == group_a).cast("long"))
                 .alias("_ca"),
                 F.sum((F.col(group_col) == group_b).cast("long"))
                 .alias("_cb")))
    w = Window.partitionBy(F.lit(1))
    base = (base.withColumn("_na", F.sum("_ca").over(w))
            .withColumn("_nb", F.sum("_cb").over(w)))
    p = F.col("_ca").cast("double") / F.col("_na").cast("double")
    q = F.col("_cb").cast("double") / F.col("_nb").cast("double")
    m = (p + q) / F.lit(2.0)
    # ln pinned to the 1e-6 grid (functions/numeric.py "pinned
    # transcendental values")
    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          det_log_units)
    _pln = lambda x: det_log_units(x) / F.lit(float(LOG_SCALE))
    term = (F.when(F.col("_ca") > 0,
                   F.lit(0.5) * p * _pln(p / m)).otherwise(F.lit(0.0))
            + F.when(F.col("_cb") > 0,
                     F.lit(0.5) * q * _pln(q / m))
            .otherwise(F.lit(0.0)))
    return (base
            .withColumn("share_a", F.round(p, 6))
            .withColumn("share_b", F.round(q, 6))
            .withColumn("jsd_term", F.round(term, 6))
            .withColumn("jsd_total",
                        F.round(F.sum(det_units(term)).over(w)
                                .cast("double") / float(DET_SCALE), 6))
            .select("bin", "share_a", "share_b", "jsd_term",
                    "jsd_total"))


def dispersion_index(df: DataFrame, count_col: str,
                     key_cols: list[str] | None = None) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) per key over a
    COUNT rollup — the standard overdispersion screen (VMR = 1 under
    Poisson; > 1 flags clumping/burstiness, the usual reason a Poisson
    rate model misfits event streams — public formula). With integer
    counts the whole statistic is exact rational arithmetic:

        VMR  = s²/x̄ = (n·Σc² − (Σc)²) / ((n−1)·Σc)
        chi2 = (n−1)·VMR = (n·Σc² − (Σc)²) / Σc    (~χ²_{n−1} under H0)

    Scale shape: callers collapse facts to per-bucket counts first
    (days, hours — the rollup is the input); this is then ONE hash
    aggregation to (n, Σc, Σc²) per key with DECIMAL(38,0) moments
    (Σc² survives billion-bucket × large-count keys), and the final
    division is the only float op. Returns (keys..., n, mean, vmr,
    chi2) rounded to 6; NULL vmr/chi2 when n < 2 or Σc = 0.
    """
    keys = list(key_cols or [])
    d38 = "decimal(38,0)"
    c = F.col(count_col).cast(d38)
    agg = df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(c).cast(d38).alias("_s"),
        F.sum((c * c).cast(d38)).cast(d38).alias("_q"))
    n = F.col("n").cast(d38)
    num = (n * F.col("_q") - F.col("_s") * F.col("_s")).cast("double")
    ok = (F.col("n") > 1) & (F.col("_s") > 0)
    # pin_round6: mean/vmr/chi2 are exact integer ratios — the
    # .5e-6-tie class (functions/numeric.py)
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    return agg.select(
        *keys, F.col("n").cast("bigint").alias("n"),
        pin_round6(F.col("_s").cast("double")
                   / F.col("n").cast("double")).alias("mean"),
        pin_round6(F.when(ok, num / ((n - 1) * F.col("_s"))
                          .cast("double"))).alias("vmr"),
        pin_round6(F.when(ok, num / F.col("_s").cast("double")))
        .alias("chi2"))


def runs_test(df: DataFrame, t_col: str, units_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of a series around its
    median — the classic screen for serial dependence/regime structure
    that a mean-level gate misses (public formula). Values equal to
    the median are dropped (the standard treatment); with n1 above /
    n2 below and R observed runs:

        μ = 2·n1·n2/(n1+n2) + 1
        σ² = 2·n1·n2·(2·n1·n2 − n1 − n2)
             / ((n1+n2)²·(n1+n2−1))
        z = (R − μ)/σ

    Scale shape: the input is the COLLAPSED integer-unit series (one
    row per bucket); the median is Spark's exact sort-based
    `percentile` — both engines interpolate lo + (hi−lo)·frac over
    exact integers, so the above/below classification is bit-portable
    — broadcast back as the standard 1-row scalar frame. Run
    boundaries come from one lag window over the collapsed series
    (single-partition global order: the rank-statistics posture, fine
    for bucket counts, never the facts). n1/n2/R are exact integers;
    μ/σ/z is one fixed double expression. Returns one row (n_above,
    n_below, runs, expected_runs, z) rounded to 6; NULL z when a side
    is empty or σ² ≤ 0.
    """
    med = df.agg(F.percentile(F.col(units_col), F.lit(0.5))
                 .alias("_med"))
    ser = (df.join(F.broadcast(med))
           .filter(F.col(units_col).cast("double") != F.col("_med"))
           .select(F.col(t_col).alias("_t"),
                   (F.col(units_col).cast("double") > F.col("_med"))
                   .cast("int").alias("_s")))
    # distributed lag (operators/ids.global_shift) — no global-sort
    # SinglePartition window even if the bucket series grows
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import global_shift
    shifted = global_shift(ser, ["_t"], ["_s"], offset=-1)
    chg = (F.col("_s") != F.col("_lag__s")).cast("int")
    # pass `shifted` (not the transformed frame) so the attr chain
    # track() set inside global_shift reaches release()
    ser = shifted.withColumn("_chg", F.coalesce(chg, F.lit(0)))
    agg = ser.agg(
        F.sum("_s").cast("bigint").alias("n_above"),
        (F.count("*") - F.sum("_s")).cast("bigint").alias("n_below"),
        (F.sum("_chg") + 1).cast("bigint").alias("runs"))
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    m = n1 + n2
    mu = F.lit(2.0) * n1 * n2 / m + F.lit(1.0)
    var = (F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - m)
           / (m * m * (m - F.lit(1.0))))
    ok = (F.col("n_above") > 0) & (F.col("n_below") > 0) & (var > 0)
    # track the FINAL frame — any later select would drop the chain
    return track(agg.select(
        "n_above", "n_below", "runs",
        F.round(F.when((F.col("n_above") > 0) & (F.col("n_below") > 0),
                       mu), 6).alias("expected_runs"),
        F.round(F.when(ok, (F.col("runs").cast("double") - mu)
                       / F.sqrt(var)), 6).alias("z")), shifted)


def mantel_haenszel(df: DataFrame, stratum_col: str, exposed_col,
                    outcome_col) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio + test across K strata — the
    confounder-adjusted companion to :func:`two_proportion_test`
    (standardized_rates adjusts RATES by weights; MH pools the
    exposure-outcome association itself, the standard epi method for
    "is the effect real after stratifying" — public formula). Per
    stratum the 2×2 is (a,b,c,d), n = a+b+c+d:

        OR_MH = Σ a·d/n ÷ Σ b·c/n
        χ²_MH = (Σa − Σ (a+b)(a+c)/n)² / Σ V,
        V = (a+b)(c+d)(a+c)(b+d) / (n²(n−1))     (no continuity corr.)

    Scale shape: ONE conditional hash aggregation collapses the facts
    to K integer 2×2 rows; every per-stratum term is a single double
    expression over those exact integers, and the four cross-stratum
    sums accumulate det-quantized (1e-6 units) in BIGINT so the
    one-row output is order-independent. Strata with n < 2 contribute
    no V (and no information); empty cells are fine. Returns
    (n_strata, observed_exposed_cases, or_mh, chi2_mh) rounded to 6;
    NULL or_mh when Σb·c/n = 0, NULL chi2 when ΣV = 0.
    """
    ex = F.col(exposed_col) if isinstance(exposed_col, str) else \
        exposed_col
    oc = F.col(outcome_col) if isinstance(outcome_col, str) else \
        outcome_col
    per = df.groupBy(F.col(stratum_col).alias("_k")).agg(
        F.sum((ex & oc).cast("long")).alias("_a"),
        F.sum((ex & ~oc).cast("long")).alias("_b"),
        F.sum((~ex & oc).cast("long")).alias("_c"),
        F.sum((~ex & ~oc).cast("long")).alias("_d"))
    a, b, c, d = (F.col(x).cast("double")
                  for x in ("_a", "_b", "_c", "_d"))
    n = a + b + c + d
    e_term = F.when(n > 0, (a + b) * (a + c) / n)
    v_term = F.when(n > 1, (a + b) * (c + d) * (a + c) * (b + d)
                    / (n * n * (n - 1)))
    scale = 1_000_000
    agg = per.agg(
        F.count("*").cast("bigint").alias("n_strata"),
        F.sum("_a").cast("bigint").alias("observed_exposed_cases"),
        (F.sum(det_units(F.when(n > 0, a * d / n), scale))
         .cast("double") / F.lit(float(scale))).alias("_sad"),
        (F.sum(det_units(F.when(n > 0, b * c / n), scale))
         .cast("double") / F.lit(float(scale))).alias("_sbc"),
        (F.sum(det_units(e_term, scale))
         .cast("double") / F.lit(float(scale))).alias("_se"),
        (F.sum(det_units(v_term, scale))
         .cast("double") / F.lit(float(scale))).alias("_sv"))
    dev = F.col("observed_exposed_cases").cast("double") - F.col("_se")
    return agg.select(
        "n_strata", "observed_exposed_cases",
        F.round(F.when(F.col("_sbc") > 0,
                       F.col("_sad") / F.col("_sbc")), 6)
        .alias("or_mh"),
        F.round(F.when(F.col("_sv") > 0, dev * dev / F.col("_sv")), 6)
        .alias("chi2_mh"))


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two label
    columns (classifier vs ground truth, annotator vs annotator): the
    evaluation-loop statistic `classification_report` doesn't give
    (public formula). Fully exact: with confusion counts n_kl, row
    totals r_k, column totals c_k, N = Σn and S = Σ_k r_k·c_k,

        po = diag/N,  pe = S/N²,
        κ = (po − pe)/(1 − pe) = (N·diag − S)/(N² − S)

    — a ratio of exact integers, one final division.

    Scale shape: one hash aggregation collapses the facts to the |C|²
    confusion cells; marginals and S come from tiny per-label rollups
    of those cells (an equi-join on the label, broadcast-sized); the
    (N, diag) and S one-row frames cross-join — the standard 1-row
    scalar-broadcast plan. DECIMAL(38,0) products so N² survives
    billion-row inputs. Returns one row (n, observed_agree, po, pe,
    kappa) rounded to 6; NULL kappa when pe = 1 (degenerate single
    label on both sides).
    """
    d38 = "decimal(38,0)"
    cells = (df.groupBy(F.col(col_a).alias("_la"),
                        F.col(col_b).alias("_lb"))
             .agg(F.count("*").alias("_c")))
    rows = cells.groupBy(F.col("_la").alias("_k")) \
        .agg(F.sum("_c").alias("_r"))
    cols = cells.groupBy(F.col("_lb").alias("_k")) \
        .agg(F.sum("_c").alias("_cc"))
    s = (rows.join(cols, "_k")
         .agg(F.coalesce(
             F.sum((F.col("_r").cast(d38)
                    * F.col("_cc").cast(d38)).cast(d38)),
             F.lit(0).cast(d38)).cast(d38).alias("_s")))
    tot = cells.agg(
        F.sum("_c").cast(d38).alias("_n"),
        F.coalesce(F.sum(F.when(F.col("_la") == F.col("_lb"),
                                F.col("_c"))), F.lit(0))
        .cast(d38).alias("_diag"))
    out = tot.join(F.broadcast(s))
    n, diag, sv = F.col("_n"), F.col("_diag"), F.col("_s")
    den = (n * n - sv).cast("double")
    # pin_round6, not F.round: po/pe/kappa are exact integer ratios —
    # the class that lands on .5e-6 rounding ties engines resolve
    # differently (functions/numeric.py, tools/tie_audit.py)
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    return out.select(
        n.cast("bigint").alias("n"),
        diag.cast("bigint").alias("observed_agree"),
        pin_round6(diag.cast("double") / n.cast("double")).alias("po"),
        pin_round6(sv.cast("double") / (n * n).cast("double"))
        .alias("pe"),
        pin_round6(F.when(den != 0.0,
                          (n * diag - sv).cast("double") / den))
        .alias("kappa"))


def cochran_armitage(df: DataFrame, score_col: str,
                     success_col) -> DataFrame:
    """Cochran-Armitage test for a linear trend in proportions across
    ordered exposure levels — the dose-response screen a plain χ²
    can't give (χ² asks "different?", CA asks "monotone in the
    scores?"; public formula). With per-level trials n_i, successes
    a_i, integer scores w_i, N = Σn, A = Σa:

        T·N   = N·Σwᵢaᵢ − A·Σwᵢnᵢ
        z     = T·N / √( A·(N−A)·(N·Σwᵢ²nᵢ − (Σwᵢnᵢ)²) / N )

    — every term inside the √ and the numerator is an EXACT integer
    (DECIMAL(38,0)); the divide-and-√ is one fixed double expression.

    Scale shape: one conditional hash aggregation collapses the facts
    to the ≤|levels| (score, n, a) rollup; the five cross-level sums
    are a second tiny aggregation. Returns one row (n, successes,
    t_scaled, z_ca) rounded to 6; NULL z when the variance term is 0
    (all one level, or A ∈ {0, N}).
    """
    d38 = "decimal(38,0)"
    suc = F.col(success_col) if isinstance(success_col, str) else \
        success_col
    per = (df.groupBy(F.col(score_col).alias("_w"))
           .agg(F.count("*").alias("_n"),
                F.sum(suc.cast("long")).alias("_a")))
    w = F.col("_w").cast(d38)
    agg = per.agg(
        F.sum("_n").cast(d38).alias("_nn"),
        F.sum("_a").cast(d38).alias("_aa"),
        F.sum((w * F.col("_a").cast(d38)).cast(d38)).cast(d38)
        .alias("_swa"),
        F.sum((w * F.col("_n").cast(d38)).cast(d38)).cast(d38)
        .alias("_swn"),
        F.sum((w * w * F.col("_n").cast(d38)).cast(d38)).cast(d38)
        .alias("_swwn"))
    n, a = F.col("_nn"), F.col("_aa")
    tn = (n * F.col("_swa") - a * F.col("_swn")).cast(d38)
    vbig = (a * (n - a)
            * (n * F.col("_swwn")
               - F.col("_swn") * F.col("_swn"))).cast(d38)
    z = tn.cast("double") / F.sqrt(vbig.cast("double")
                                   / n.cast("double"))
    # pin_round6: t_scaled is an exact integer ratio — the
    # .5e-6-tie class (functions/numeric.py)
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    return agg.select(
        n.cast("bigint").alias("n"),
        a.cast("bigint").alias("successes"),
        pin_round6(tn.cast("double") / n.cast("double"))
        .alias("t_scaled"),
        pin_round6(F.when(vbig > 0, z)).alias("z_ca"))


def pettitt_test(df: DataFrame, t_col: str,
                 units_col: str) -> DataFrame:
    """Pettitt change-point test — nonparametric "when did the level
    shift" companion to the CUSUM chart (CUSUM draws the drift curve;
    Pettitt locates the single most likely break and attaches a
    significance; public method). Rank formulation over the series:

        U_t = 2·Σ_{i≤t} R_i − t·(n+1)   (average ranks for ties)
        K   = max_{t<n} |U_t|,   t* = argmax (earliest on ties)
        p   ≈ min(1, 2·exp(−6K² / (n³+n²)))

    Exactness: ranks use the half-unit integer construction
    (2R = 2·rank_min + ties − 1, the MWU convention), so U_t is an
    exact integer in 2U units; only the final p expression runs in
    doubles. Scale shape: both global orders — the value-order rank
    and the time-order cumsum — run as DISTRIBUTED prefix sums over
    collapsed supports (``global_cumsum``: range-partitioned, no
    SinglePartition exchange), so neither a near-continuous value
    column nor a long series funnels through one task. Returns one
    row (n, change_t, k_stat, p_value) rounded to 6; NULL for n < 2.
    """
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import (global_cumsum,
                                                      with_global_index)
    ser0 = df.select(F.col(t_col).alias("_t"),
                     F.col(units_col).alias("_u"))
    # half-unit average ranks from the collapsed value support:
    # 2R = 2·cum − ties + 1 (the MWU convention), distributed
    support = global_cumsum(
        ser0.groupBy("_u").agg(F.count("*").alias("_c")),
        ["_u"], ["_c"])
    rmap = support.select(
        "_u", (2 * F.col("_cum__c") - F.col("_c") + 1).alias("_r2"))
    tot = F.broadcast(support.agg(
        F.max("_cum__c").cast("long").alias("_n")))
    ser = (ser0.join(rmap, "_u").crossJoin(tot)
           .withColumn("_r2", F.col("_r2").cast("long")))
    ser_cum = global_cumsum(with_global_index(ser, ["_t"], id_col="_idx"),
                            ["_t"], ["_r2"])
    # track ser_cum (the direct helper return — withColumn would drop
    # its attr chain) so release() frees both persisted cumsum bases
    ser = ser_cum.withColumn(
        "_u2", F.col("_cum__r2") - F.col("_idx") * (F.col("_n") + 1))
    inner = ser.filter(F.col("_idx") < F.col("_n"))
    best = inner.agg(
        F.max("_n").cast("bigint").alias("n"),
        F.max(F.struct(F.abs(F.col("_u2")).alias("k2"),
                       (-F.col("_t")).alias("mt"))).alias("_b"))
    nd = F.col("n").cast("double")
    k = F.col("_b.k2").cast("double") / F.lit(2.0)
    p = F.least(F.lit(1.0),
                F.lit(2.0) * F.exp(F.lit(-6.0) * k * k
                                   / (nd * nd * nd + nd * nd)))
    # track the FINAL frame — any later select would drop the chain
    return track(best.select(
        "n", (-F.col("_b.mt")).alias("change_t"),
        F.round(k, 6).alias("k_stat"),
        F.round(F.when(F.col("n") > 1, p), 6).alias("p_value")),
        support, ser_cum)


def uncertainty_coefficient(df: DataFrame, x_col: str,
                            y_col: str) -> DataFrame:
    """Theil's uncertainty coefficient between two categorical columns
    — the normalized, ASYMMETRIC "how much of Y does knowing X
    explain" (U(Y|X) = I(X;Y)/H(Y)), the standard categorical
    association profile for feature screens where Cramér's V hides
    direction (public formula). Entropies in nats via the count form
    H = ln N − (Σ c·ln c)/N, so

        MI = H(X) + H(Y) − H(X,Y),
        U(Y|X) = MI/H(Y),  U(X|Y) = MI/H(X)

    Scale shape: one hash aggregation to the |X|·|Y| contingency
    cells; margins are rollups OF THE CELLS; the three c·ln c sums
    accumulate as exact DECIMAL(38,0) integer sums of counts times
    1e-6-grid-pinned ln values, so the one-row output is
    order-independent; the 1-row margin frames cross-join as scalar
    broadcasts. ln N is pinned to the SAME grid, so a constant
    column's entropy is exactly 0 (N·pin(ln N) − N·pin(ln N)), not a
    sub-grid artifact — the NULL-U guard then fires correctly.
    Returns (n, h_x, h_y, mi, u_y_given_x, u_x_given_y) rounded to 6;
    NULL U when the denominator entropy is 0 (constant column).
    """
    c = F.col("_c")
    # c * pinned-ln(c): ln pinned to the shared 1e-6 grid BEFORE the
    # count multiply (a raw c*ln(c) addend amplifies a cross-engine
    # libm ulp by c*scale — functions/numeric.py "pinned
    # transcendental values"). Cast c to decimal(38,0) BEFORE the
    # multiply: an int64 product wraps at margin counts c ≈ 3.3e11
    # (c·|ln c|·1e6 > 2^63) while the oracle multiplies in HUGEINT —
    # the decimal must protect the per-row product, not just the sum.
    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          grid_mean)
    clnc_u = (c.cast("decimal(38,0)")
              * F.floor(F.log(c.cast("double"))
                        * F.lit(float(LOG_SCALE)) + F.lit(0.5))
              .cast("decimal(38,0)"))
    _pin_sum = lambda: F.sum(clnc_u)  # noqa: E731 — exact decimal units
    cells = (df.groupBy(F.col(x_col).alias("_x"),
                        F.col(y_col).alias("_y"))
             .agg(F.count("*").alias("_c")))
    tot = cells.agg(
        F.sum("_c").cast("bigint").alias("n"),
        _pin_sum().alias("_sxy"))
    mx = (cells.groupBy("_x").agg(F.sum("_c").alias("_c"))
          .agg(_pin_sum().alias("_sx")))
    my = (cells.groupBy("_y").agg(F.sum("_c").alias("_c"))
          .agg(_pin_sum().alias("_sy")))
    out = tot.join(F.broadcast(mx)).join(F.broadcast(my))
    nd = F.col("n").cast("double")
    # Everything below is EXACT integer arithmetic in grid units until
    # the final grid_mean rounding: H·N·scale numerators are
    # N·pin(ln N) − Σ c·pin(ln c) (decimal), so a constant column's
    # entropy numerator is exactly 0 (the NULL-U guard is an integer
    # compare), mi numerators telescope (the ln N terms cancel
    # symbolically), and no double round() tie is ever resolved.
    pin_n = (F.floor(F.log(nd) * F.lit(float(LOG_SCALE)) + F.lit(0.5))
             .cast("decimal(38,0)"))
    nn = F.col("n").cast("decimal(38,0)")
    hx_num = nn * pin_n - F.col("_sx")
    hy_num = nn * pin_n - F.col("_sy")
    mi_num = nn * pin_n - F.col("_sx") - F.col("_sy") + F.col("_sxy")
    million = F.lit(1_000_000).cast("decimal(38,0)")
    return out.select(
        "n",
        grid_mean(hx_num, F.col("n")).alias("h_x"),
        grid_mean(hy_num, F.col("n")).alias("h_y"),
        grid_mean(mi_num, F.col("n")).alias("mi"),
        F.when(hy_num > 0,
               grid_mean(mi_num * million, hy_num)).alias("u_y_given_x"),
        F.when(hx_num > 0,
               grid_mean(mi_num * million, hx_num)).alias("u_x_given_y"))


# Abramowitz & Stegun 7.1.26 erfc coefficients (public; |err| < 1.5e-7
# — two decades below the 6-dp rounding every consumer applies). Kept
# as module constants so the oracle SQL generator emits the SAME
# literals and Horner ordering — the p-value is then a fixed double
# expression, bit-identical across engines.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741,
         -1.453152027, 1.061405429)


def normal_two_sided_p(z):
    """2·(1−Φ(|z|)) = erfc(|z|/√2) via the A&S 7.1.26 polynomial —
    Spark Column expression, Horner form."""
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    a1, a2, a3, a4, a5 = (F.lit(a) for a in _AS_A)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return poly * F.exp(-x * x)


def normal_two_sided_p_sql(z_expr: str) -> str:
    """DuckDB mirror of :func:`normal_two_sided_p` — same literals,
    same Horner ordering, same abs/√2 prelude."""
    x = f"(abs({z_expr}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_AS_P!r} * {x}))"
    a1, a2, a3, a4, a5 = (repr(a) for a in _AS_A)
    poly = (f"({t} * ({a1} + {t} * ({a2} + {t} * ({a3} + {t} "
            f"* ({a4} + {t} * {a5})))))")
    return f"({poly} * exp(-{x} * {x}))"


def welch_vs_rest_bh(df: DataFrame, key_col: str, units_col: str,
                     alpha: float = 0.05) -> DataFrame:
    """Per-group deviation screen with multiple-testing control: for
    every key, Welch-test its integer-unit values against ALL OTHER
    rows pooled, convert z to a two-sided p (portable A&S normal
    approximation), then Benjamini-Hochberg-adjust across the K tests
    — the standard "which segments moved, without K·α false alarms"
    monitoring gate (public procedures).

    Exactness: one hash aggregation to per-key (n, Σu, Σu²) in
    DECIMAL(38,0); the rest-of-population stats are EXACT complements
    (N−n, S−s, Q−q) from unbounded windows over the K-row rollup — no
    second data pass; means/variances are fixed double expressions
    over those integers. BH runs entirely on the K-row frame:
    ascending-p row_number (key tiebreak), raw = p·K/rank, suffix
    cummin, cap at 1. Tied p's adjust identically regardless of rank
    order (the suffix min absorbs the tie block). Returns one row per
    key (key, n, z, p_raw, p_adj, reject) rounded to 6.
    """
    d38 = "decimal(38,0)"
    u = F.col(units_col).cast(d38)
    per = (df.groupBy(F.col(key_col).alias("key"))
           .agg(F.count("*").alias("_n"),
                F.sum(u).cast(d38).alias("_s"),
                F.sum((u * u).cast(d38)).cast(d38).alias("_q")))
    w = Window.partitionBy(F.lit(1))
    per = (per.withColumn("_nn", F.sum("_n").over(w))
           .withColumn("_ss", F.sum("_s").over(w).cast(d38))
           .withColumn("_qq", F.sum("_q").over(w).cast(d38)))
    n1 = F.col("_n").cast(d38)
    n2 = (F.col("_nn").cast(d38) - n1).cast(d38)
    s1, q1 = F.col("_s"), F.col("_q")
    s2 = (F.col("_ss") - s1).cast(d38)
    q2 = (F.col("_qq") - q1).cast(d38)
    n1d = n1.cast("double")
    n2d = n2.cast("double")
    m1 = s1.cast("double") / n1d
    m2 = s2.cast("double") / n2d
    v1 = (n1 * q1 - s1 * s1).cast("double") / (n1 * (n1 - 1)) \
        .cast("double")
    v2 = (n2 * q2 - s2 * s2).cast("double") / (n2 * (n2 - 1)) \
        .cast("double")
    ok = (F.col("_n") > 1) & ((F.col("_nn") - F.col("_n")) > 1)
    z = F.when(ok & ((v1 / n1d + v2 / n2d) > 0),
               (m1 - m2) / F.sqrt(v1 / n1d + v2 / n2d))
    scored = per.select("key", F.col("_n").cast("bigint").alias("n"),
                        z.alias("_z"),
                        normal_two_sided_p(z).alias("_p"))
    # m counts VALID tests (non-null p); degenerate groups (n ≤ 1 →
    # null z/p) sort last and inherit null adj — filter them upstream
    # if they should not appear at all
    m = F.count("_p").over(w)
    rk = F.row_number().over(
        Window.orderBy(F.col("_p").asc_nulls_last(), "key"))
    scored = (scored.withColumn("_m", m).withColumn("_rk", rk)
              .withColumn("_raw", F.col("_p") * F.col("_m")
                          .cast("double") / F.col("_rk")
                          .cast("double")))
    w_suffix = (Window.orderBy(F.col("_rk").desc())
                .rowsBetween(Window.unboundedPreceding, 0))
    adj = F.least(F.lit(1.0), F.min("_raw").over(w_suffix))
    return (scored.withColumn("_adj", adj)
            .select("key", "n",
                    F.round("_z", 6).alias("z"),
                    F.round("_p", 6).alias("p_raw"),
                    F.round("_adj", 6).alias("p_adj"),
                    (F.col("_adj") <= F.lit(float(alpha)))
                    .alias("reject")))


def partial_correlation(df: DataFrame, x_units: str, y_units: str,
                        z_units: str) -> DataFrame:
    """First-order partial correlation r_xy·z — "are x and y related
    once the confounder z is held fixed", the screen that separates a
    real association from one both variables inherit from a third
    (public formula):

        r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)·(1−r_yz²))

    Exactness: inputs are integer-unit columns; ONE hash aggregation
    produces the nine DECIMAL(38,0) moments; each pairwise r is the
    n-scaled-covariance ratio (n·Σxy − Σx·Σy over the √ of the
    matching variance products — n² cancels), a fixed double
    expression over exact integers, and the partial-r combination is
    one more fixed expression. Returns one row (n, r_xy, r_xz, r_yz,
    r_xy_z) rounded to 6; NULL r's where a variance is 0, NULL
    partial where a control correlation is ±1.
    """
    d38 = "decimal(38,0)"
    x = F.col(x_units).cast(d38)
    y = F.col(y_units).cast(d38)
    z = F.col(z_units).cast(d38)
    m = df.agg(
        F.count("*").alias("n"),
        *[F.sum(expr.cast(d38)).cast(d38).alias(name)
          for name, expr in (
              ("_sx", x), ("_sy", y), ("_sz", z),
              ("_sxx", x * x), ("_syy", y * y), ("_szz", z * z),
              ("_sxy", x * y), ("_sxz", x * z), ("_syz", y * z))])
    n = F.col("n").cast(d38)

    def cov(sab, sa, sb):
        return (n * F.col(sab) - F.col(sa) * F.col(sb)).cast("double")

    def var(saa, sa):
        return (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")

    vx, vy, vz = var("_sxx", "_sx"), var("_syy", "_sy"), \
        var("_szz", "_sz")
    r_xy = F.when((vx > 0) & (vy > 0),
                  cov("_sxy", "_sx", "_sy") / F.sqrt(vx * vy))
    r_xz = F.when((vx > 0) & (vz > 0),
                  cov("_sxz", "_sx", "_sz") / F.sqrt(vx * vz))
    r_yz = F.when((vy > 0) & (vz > 0),
                  cov("_syz", "_sy", "_sz") / F.sqrt(vy * vz))
    den = (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
    partial = F.when(den > 0, (r_xy - r_xz * r_yz) / F.sqrt(den))
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(r_xy, 6).alias("r_xy"),
        F.round(r_xz, 6).alias("r_xz"),
        F.round(r_yz, 6).alias("r_yz"),
        F.round(partial, 6).alias("r_xy_z"))


def kruskal_wallis(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Kruskal–Wallis H test — the k-group rank ANOVA (public formula;
    reference analog: the ad-hoc per-group comparisons in the SMS
    monitoring SQL, generalized): "do the k groups share a location?"
    without the normality assumption one_way_anova needs.

        H = [ 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1) ] / C
        C = 1 − Σ(t³−t)/(N³−N)          (tie correction)

    Exactness (the repo's collapsed-support rank construction, as in
    ``mann_whitney_u``): values collapse to per-(group, value) counts;
    average ranks are exact half-unit integers over the collapsed
    support (r2 = 2·cumcount − t + 1); per-group rank sums accumulate
    as DECIMAL(38,0) (R2_g = 2·R_g is an integer). The Σ_g term is
    evaluated as a per-group DEVIATION from its null expectation
    (term'_g = R2_g²/(4n_g)·12/(N(N+1)) − 3(N+1)·n_g/N, a fixed IEEE
    expression whose addends are H-magnitude, not N-magnitude) and
    det-summed across groups, so the result is partition- and
    engine-invariant at any N within det_units capacity.

    Scale shape: one hash agg to the collapsed (group,value) counts,
    one window cumsum over the collapsed VALUE SUPPORT (single ordered
    pass over distinct values — the domain, not the rows), one hash
    agg per group, one global agg over k group rows. Returns one row
    (n_total, k_groups, h_stat, df, epsilon_sq) with floats rounded
    to 6; epsilon² = (H − k + 1)/(N − k) is the rank effect size.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    d38 = "decimal(38,0)"
    counts = (df.filter(F.col(group_col).isNotNull()
                        & F.col(value_col).isNotNull())
              .groupBy(F.col(group_col).alias("_g"),
                       F.col(value_col).alias("_v"))
              .agg(F.count("*").alias("_c")))
    from pipelines_rj_sms_spark.operators.ids import global_cumsum
    support = global_cumsum(
        counts.groupBy("_v").agg(F.sum("_c").alias("_t")),
        ["_v"], ["_t"])
    ranked = support.select(
        "_v",
        (2 * F.col("_cum__t") - F.col("_t") + 1).cast(d38)
        .alias("_r2"))
    per_group = (counts.join(ranked, "_v")
                 .groupBy("_g")
                 .agg(F.sum("_c").cast(d38).alias("_ng"),
                      F.sum(F.col("_c").cast(d38) * F.col("_r2"))
                      .cast(d38).alias("_r2g")))
    ties = support.agg(
        F.sum(F.col("_t").cast(d38) * F.col("_t").cast(d38)
              * F.col("_t").cast(d38) - F.col("_t").cast(d38))
        .alias("_ties"))
    totals = per_group.agg(F.sum("_ng").cast(d38).alias("_n"),
                           F.count("*").alias("_k"))
    nd = F.col("_n").cast("double")
    td = F.col("_r2g").cast("double")
    ngd = F.col("_ng").cast("double")
    # per-group deviation from the null expectation — H-magnitude
    # addends, det-summed so the k-way combine order cannot matter
    dev = (td * td / (4.0 * ngd) * 12.0 / (nd * (nd + 1.0))
           - 3.0 * (nd + 1.0) * ngd / nd)
    stat = (per_group.crossJoin(F.broadcast(totals))
            .agg(det_sum(dev).alias("_h0"),
                 F.max("_n").alias("_n"), F.max("_k").alias("_k"))
            .crossJoin(F.broadcast(ties)))
    n2 = F.col("_n").cast("double")
    c_tie = (F.lit(1.0) - F.col("_ties").cast("double")
             / (n2 * n2 * n2 - n2))
    h = F.when(c_tie > 0, F.col("_h0") / c_tie)
    kd = F.col("_k").cast("double")
    eps2 = F.when(n2 > kd, (h - kd + 1.0) / (n2 - kd))
    from pipelines_rj_sms_spark.operators.cache import track
    return track(stat.select(
        F.col("_n").cast("bigint").alias("n_total"),
        F.col("_k").cast("int").alias("k_groups"),
        F.round(h, 6).alias("h_stat"),
        (F.col("_k") - 1).cast("int").alias("df"),
        F.round(eps2, 6).alias("epsilon_sq")), support)


def durbin_watson(df: DataFrame, t_col: str,
                  units_col: str) -> DataFrame:
    """Durbin-Watson first-order serial-correlation statistic of the
    residuals around the series' OLS trend line (public formula;
    DW ≈ 2 means no lag-1 autocorrelation, → 0 positive, → 4
    negative) — the residual-independence check behind every
    trend-line readout (`trend_fit`, ridge), which assumes i.i.d.
    errors.

        DW = Σ_{t≥2} (e_t − e_{t−1})² / Σ e_t²

    Exactness: the OLS fit comes from one DECIMAL(38,0) moment
    aggregation (exact integers; slope/intercept are fixed double
    expressions); residuals are one IEEE expression per row;
    the two quadratic sums det-quantize at 1e-6 units (addends are
    squared residuals — |e|² · 1e6 must stay < 2⁵³, i.e. |e| < 9e4
    units; pass count-like or collapsed series, not raw cents).
    Scale shape: input is a COLLAPSED series (daily buckets); one
    1-row broadcast of the fit, one lag window over the collapsed
    spine, one final agg. Returns (n, slope, intercept, dw) rounded
    to 6.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    d38 = "decimal(38,0)"
    t = F.col(t_col).cast(d38)
    y = F.col(units_col).cast(d38)
    m = F.broadcast(df.agg(
        F.count("*").alias("_n"),
        F.sum(t).cast(d38).alias("_st"),
        F.sum(y).cast(d38).alias("_sy"),
        F.sum((t * t).cast(d38)).cast(d38).alias("_stt"),
        F.sum((t * y).cast(d38)).cast(d38).alias("_sty")))
    n = F.col("_n").cast(d38)
    b = ((n * F.col("_sty") - F.col("_st") * F.col("_sy"))
         .cast("double")
         / (n * F.col("_stt") - F.col("_st") * F.col("_st"))
         .cast("double"))
    a = ((F.col("_sy").cast("double")
          - b * F.col("_st").cast("double"))
         / F.col("_n").cast("double"))
    e = (F.col(units_col).cast("double")
         - (a + b * F.col(t_col).cast("double")))
    scale = 1_000_000
    # distributed lag of the residual series (operators/ids
    # .global_shift) — no SinglePartition global-sort window
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import global_shift
    rows0 = global_shift(
        df.crossJoin(m)
        .select(F.col(t_col).alias("_gt"), e.alias("_e"),
                F.col("_n"), a.alias("_a"), b.alias("_b")),
        ["_gt"], ["_e"], offset=-1)
    # keep rows0 (direct helper return) for track() — withColumn drops
    # the attr chain global_shift attached
    rows = rows0.withColumn("_ep", F.col("_lag__e"))
    agg = rows.agg(
        F.max("_n").alias("n"),
        F.max("_a").alias("intercept"),
        F.max("_b").alias("slope"),
        det_sum(F.when(F.col("_ep").isNotNull(),
                       (F.col("_e") - F.col("_ep"))
                       * (F.col("_e") - F.col("_ep")))
                .otherwise(F.lit(0.0)), scale).alias("_num"),
        det_sum(F.col("_e") * F.col("_e"), scale).alias("_den"))
    return track(agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round(F.when(F.col("_den") > 0,
                       F.col("_num") / F.col("_den")), 6).alias("dw")),
        rows0)


def jarque_bera(df: DataFrame, units_col: str) -> DataFrame:
    """Jarque-Bera normality test from standardized sample moments
    (public formula): JB = n·(g1²/6 + (g2−3)²/24), g1 = skewness,
    g2 = kurtosis — the distribution-shape gate in front of any
    "assume it's normal" model (Welch, control charts, z anomalies).

    Determinism route: μ and population σ come from EXACT
    DECIMAL(38,0) integer moments (two fixed double expressions);
    each row standardizes z = (u − μ)/σ in one IEEE expression, and
    Σz², Σz³, Σz⁴ det-quantize at 1e-6 units. |z| ≤ √n by
    construction, so the biggest addend z⁴ ≤ n² — capacity holds to
    n ~ 5e4 buckets at 1e-6 units and the g-ratios self-correct any
    σ rounding (g1 = m3/m2^1.5 uses the measured m2, not 1). Input
    is a collapsed/bucketed series, one hash agg + one broadcast +
    one final agg. One row: (n, skewness, kurtosis, jb_stat) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    d38 = "decimal(38,0)"
    u = F.col(units_col).cast(d38)
    m = F.broadcast(df.agg(
        F.count("*").alias("_n"),
        F.sum(u).cast(d38).alias("_s"),
        F.sum((u * u).cast(d38)).cast(d38).alias("_q")))
    n = F.col("_n").cast(d38)
    var_num = (n * F.col("_q") - F.col("_s") * F.col("_s"))
    mu = F.col("_s").cast("double") / F.col("_n").cast("double")
    sigma = (F.sqrt(var_num.cast("double"))
             / F.col("_n").cast("double"))
    z = (F.col(units_col).cast("double") - mu) / sigma
    scale = 1_000_000
    agg = (df.crossJoin(m)
           .agg(F.max("_n").alias("n"),
                det_sum(z * z, scale).alias("_m2s"),
                det_sum(z * z * z, scale).alias("_m3s"),
                det_sum(z * z * z * z, scale).alias("_m4s")))
    nd = F.col("n").cast("double")
    m2 = F.col("_m2s") / nd
    m3 = F.col("_m3s") / nd
    m4 = F.col("_m4s") / nd
    g1 = F.when(m2 > 0, m3 / F.sqrt(m2 * m2 * m2))
    g2 = F.when(m2 > 0, m4 / (m2 * m2))
    jb = nd * (g1 * g1 / 6.0
               + (g2 - 3.0) * (g2 - 3.0) / 24.0)
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(g1, 6).alias("skewness"),
        F.round(g2, 6).alias("kurtosis"),
        F.round(jb, 6).alias("jb_stat"))


def grubbs_statistic(df: DataFrame, units_col: str) -> DataFrame:
    """Grubbs' max-studentized-deviation outlier statistic
    G = max|u − ū| / s (sample s, public formula) plus the offending
    value — the single-most-extreme-point screen that quantile fences
    (winsorize/MAD) don't report. Exact DECIMAL moments for ū and s;
    the max is order-free, so no quantization is needed anywhere.
    One row: (n, mean, stddev, g_stat, extreme_value) @6dp.
    """
    d38 = "decimal(38,0)"
    u = F.col(units_col).cast(d38)
    m = F.broadcast(df.agg(
        F.count("*").alias("_n"),
        F.sum(u).cast(d38).alias("_s"),
        F.sum((u * u).cast(d38)).cast(d38).alias("_q")))
    n = F.col("_n").cast(d38)
    mu = F.col("_s").cast("double") / F.col("_n").cast("double")
    # sample variance: (n·Σu² − S²) / (n·(n−1)), exact integer top
    svar = ((n * F.col("_q") - F.col("_s") * F.col("_s"))
            .cast("double")
            / (n * (n - 1)).cast("double"))
    s = F.sqrt(svar)
    dev = F.abs(F.col(units_col).cast("double") - mu)
    agg = (df.crossJoin(m)
           .agg(F.max("_n").alias("n"), F.max(mu).alias("_mu"),
                F.max(s).alias("_sd"),
                F.max(F.struct(dev.alias("d"),
                               F.col(units_col).cast("double")
                               .alias("v"))).alias("_mx")))
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round("_mu", 6).alias("mean"),
        F.round("_sd", 6).alias("stddev"),
        F.round(F.when(F.col("_sd") > 0,
                       F.col("_mx.d") / F.col("_sd")), 6)
        .alias("g_stat"),
        F.round(F.col("_mx.v"), 6).alias("extreme_value"))


def friedman_test(df: DataFrame, block_col: str, treatment_col: str,
                  units_col: str) -> DataFrame:
    """Friedman rank test for k related treatments over n blocks —
    "do the treatments differ when each block is its own control?"
    (repeated-measures rank ANOVA; public formula, Conover's
    tie-corrected form). Input must be COMPLETE blocks (one row per
    (block, treatment); gap-fill zeros first if a block can miss a
    treatment).

    Exactness: within-block average ranks in half-units
    (r2 = 2·min_rank + ties − 1, an integer window expression over
    each ≤k-row block); Conover's statistic in the 2-rank scale —

        T = (k−1)·Σ_j (R2_j − n(k+1))² / (Σ r2² − n·k·(k+1)²)

    — where the 4s cancel, so numerator and denominator are EXACT
    DECIMAL(38,0) integers and the single final division is the only
    float op. Degenerate blocks-all-tied data has a zero denominator
    → NULL. Scale shape: one rank window partitioned BY BLOCK (≤k
    rows each), one hash agg per treatment, one k-row final agg.
    One row: (n_blocks, k_treatments, statistic, df) @6dp.
    """
    d38 = "decimal(38,0)"
    wb = (Window.partitionBy(block_col)
          .orderBy(F.col(units_col)))
    wt = Window.partitionBy(block_col, units_col)
    r2 = (2 * F.rank().over(wb) + F.count("*").over(wt) - 1).cast(d38)
    ranked = df.select(
        F.col(block_col).alias("_blk"),
        F.col(treatment_col).alias("_trt"), r2.alias("_r2"))
    per_t = ranked.groupBy("_trt").agg(
        F.count("*").cast(d38).alias("_n"),
        F.sum("_r2").cast(d38).alias("_rj"),
        F.sum((F.col("_r2") * F.col("_r2")).cast(d38)).cast(d38)
        .alias("_rsq"))
    agg = per_t.agg(
        F.max("_n").alias("_nb"),
        F.count("*").alias("_k"),
        F.sum("_rsq").cast(d38).alias("_a"))
    # Σ_j (R2_j − n(k+1))² needs n and k first; fold via a second
    # pass over the k-row rollup (broadcast of the 1-row totals)
    tot = F.broadcast(agg.select("_nb", "_k", "_a"))
    n = F.col("_nb").cast(d38)
    k = F.col("_k").cast(d38)
    dev = F.col("_rj") - n * (k + 1)
    stat = (per_t.crossJoin(tot)
            .agg(F.max("_nb").alias("n_blocks"),
                 F.max("_k").alias("k_treatments"),
                 F.sum((dev * dev).cast(d38)).cast(d38).alias("_num"),
                 F.max((F.col("_a")
                        - n * k * ((k + 1) * (k + 1)).cast(d38))
                       .cast(d38)).alias("_den")))
    t1 = F.when(
        F.col("_den") > 0,
        (F.col("k_treatments") - 1).cast("double")
        * (F.col("_num").cast("double")
           / F.col("_den").cast("double")))
    return stat.select(
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.col("k_treatments").cast("int").alias("k_treatments"),
        F.round(t1, 6).alias("statistic"),
        (F.col("k_treatments") - 1).cast("int").alias("df"))


def hellinger_distance(df: DataFrame, group_col: str, value_col: str,
                       group_a, group_b, lo: float, hi: float,
                       n_bins: int = 20) -> DataFrame:
    """Hellinger distance + Bhattacharyya coefficient between two
    groups' binned value distributions (public formulas) — the
    [0, 1]-bounded METRIC companion to `jensen_shannon_divergence`
    (JSD isn't a metric; Hellinger triangle-inequalities, so it
    composes into clustering/thresholding):

        BC = Σ √(p_i·q_i),  H = √(1 − BC),  B-dist = −ln BC

    Same fixed equal-width [lo, hi) binning as the JSD gate (edges
    clamp, no quantile estimation); p/q are exact BIGINT rationals;
    the ≤n_bins √pq addends det-quantize. 1 − BC is clamped at 0
    before the √ (quantization can land −1e-9 when p ≡ q). One row:
    (n_a, n_b, bhattacharyya, hellinger, b_distance) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    width = (float(hi) - float(lo)) / int(n_bins)
    raw_bin = F.floor((F.col(value_col) - F.lit(float(lo)))
                      / F.lit(width)).cast("int")
    bin_c = F.least(F.greatest(raw_bin, F.lit(0)),
                    F.lit(int(n_bins) - 1))
    per = (df.filter(F.col(value_col).isNotNull()
                     & F.col(group_col).isin(group_a, group_b))
           .groupBy(bin_c.alias("bin"))
           .agg(F.sum((F.col(group_col) == group_a).cast("long"))
                .alias("_ca"),
                F.sum((F.col(group_col) == group_b).cast("long"))
                .alias("_cb")))
    tot = F.broadcast(per.agg(F.sum("_ca").alias("_na"),
                              F.sum("_cb").alias("_nb")))
    p = F.col("_ca").cast("double") / F.col("_na").cast("double")
    q = F.col("_cb").cast("double") / F.col("_nb").cast("double")
    agg = (per.crossJoin(tot)
           .agg(F.max("_na").alias("n_a"), F.max("_nb").alias("n_b"),
                det_sum(F.sqrt(p * q)).alias("_bc")))
    bc = F.col("_bc")
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(bc, 6).alias("bhattacharyya"),
        F.round(F.sqrt(F.greatest(F.lit(1.0) - bc, F.lit(0.0))), 6)
        .alias("hellinger"),
        F.round(F.when(bc > 0, -F.log(bc)), 6).alias("b_distance"))


def cohens_d(df: DataFrame, group_col: str, units_col: str,
             group_a, group_b) -> DataFrame:
    """Cohen's d / Hedges' g standardized mean difference between two
    groups (public formulas) — the EFFECT SIZE the t-test's p-value
    doesn't carry (significance scales with N; d doesn't):

        d = (x̄_a − x̄_b) / s_pooled,
        s_pooled² = [(n_a−1)s_a² + (n_b−1)s_b²] / (n_a+n_b−2)
        g = d·(1 − 3/(4(n_a+n_b) − 9))    (small-sample correction)

    Integer-unit inputs; one conditional hash aggregation produces
    both groups' DECIMAL(38,0) moments; (n−1)s² = (nΣx²−S²)/n keeps
    the numerators exact, and d/g are fixed double expressions. One
    row: (n_a, n_b, mean_a, mean_b, cohens_d, hedges_g) @6dp; NULL
    when either group has <2 rows or zero pooled variance.
    """
    d38 = "decimal(38,0)"
    u = F.col(units_col).cast(d38)
    in_a = (F.col(group_col) == F.lit(group_a))
    in_b = (F.col(group_col) == F.lit(group_b))
    m = (df.filter((in_a | in_b) & F.col(units_col).isNotNull())
         .agg(F.sum(in_a.cast("long")).cast(d38).alias("_n1"),
              F.sum(in_b.cast("long")).cast(d38).alias("_n2"),
              F.sum(F.when(in_a, u).otherwise(F.lit(0)).cast(d38))
              .cast(d38).alias("_s1"),
              F.sum(F.when(in_b, u).otherwise(F.lit(0)).cast(d38))
              .cast(d38).alias("_s2"),
              F.sum(F.when(in_a, (u * u).cast(d38))
                    .otherwise(F.lit(0)).cast(d38)).cast(d38)
              .alias("_q1"),
              F.sum(F.when(in_b, (u * u).cast(d38))
                    .otherwise(F.lit(0)).cast(d38)).cast(d38)
              .alias("_q2")))
    n1, n2 = F.col("_n1"), F.col("_n2")
    v1 = ((n1 * F.col("_q1") - F.col("_s1") * F.col("_s1"))
          .cast("double") / n1.cast("double"))
    v2 = ((n2 * F.col("_q2") - F.col("_s2") * F.col("_s2"))
          .cast("double") / n2.cast("double"))
    mean1 = F.col("_s1").cast("double") / n1.cast("double")
    mean2 = F.col("_s2").cast("double") / n2.cast("double")
    sp = F.sqrt((v1 + v2) / (n1 + n2 - 2).cast("double"))
    ok = (n1 > 1) & (n2 > 1) & (sp > 0)
    d = (mean1 - mean2) / sp
    g = d * (F.lit(1.0)
             - F.lit(3.0) / (F.lit(4.0) * (n1 + n2).cast("double")
                             - F.lit(9.0)))
    return m.select(
        n1.cast("bigint").alias("n_a"), n2.cast("bigint").alias("n_b"),
        F.round(mean1, 6).alias("mean_a"),
        F.round(mean2, 6).alias("mean_b"),
        F.round(F.when(ok, d), 6).alias("cohens_d"),
        F.round(F.when(ok, g), 6).alias("hedges_g"))


def cramer_von_mises(df: DataFrame, group_col: str, value_col: str,
                     group_a, group_b) -> DataFrame:
    """Two-sample Cramér-von Mises statistic — the INTEGRATED ECDF
    distance (public formula), more sensitive than the KS supremum to
    distributional differences spread across the whole range:

        T = n_a·n_b/(n_a+n_b)² · Σ_x w_x·(F_a(x) − F_b(x))²

    summed over the combined sample (w_x = combined multiplicity at
    x — the standard tie-adapted spelling on a collapsed support).

    Same collapsed-support discipline as `ks_two_sample`: one hash
    agg to per-value (count_a, count_b), one ordered window for the
    cumulative ECDFs (exact BIGINT rationals), det_sum_big for the
    w·ΔF² addends (each ≤ w_x; Σ ≤ n_a+n_b — capacity survives
    billion-row groups), one closed-form final expression. One row:
    (n_a, n_b, t_stat) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum_big

    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import global_cumsum
    counts = (df.filter((in_a | in_b) & F.col(value_col).isNotNull())
              .groupBy(F.col(value_col).alias("_v"))
              .agg(F.sum(in_a.cast("long")).alias("_ca"),
                   F.sum(in_b.cast("long")).alias("_cb")))
    # distributed ECDF cumsums + broadcast grand totals (= last prefix
    # sums) — no SinglePartition exchange on the value support
    cc = global_cumsum(counts, ["_v"], ["_ca", "_cb"])
    tots = F.broadcast(cc.agg(F.max("_cum__ca").alias("_na"),
                              F.max("_cum__cb").alias("_nb")))
    df_gap = (F.col("_cum__ca").cast("double") / F.col("_na").cast("double")
              - F.col("_cum__cb").cast("double") / F.col("_nb").cast("double"))
    addend = ((F.col("_ca") + F.col("_cb")).cast("double")
              * df_gap * df_gap)
    agg = (cc.crossJoin(tots)
           .select(F.col("_na"), F.col("_nb"), addend.alias("_w"))
           .agg(F.max("_na").alias("n_a"), F.max("_nb").alias("n_b"),
                det_sum_big(F.col("_w")).alias("_s")))
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    t = (nad * nbd / ((nad + nbd) * (nad + nbd))) * F.col("_s")
    return track(agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), t), 6)
        .alias("t_stat")), cc)


def eb_shrunk_rates(df: DataFrame, key_cols: list[str],
                    hits_col: str, trials_col: str) -> DataFrame:
    """Empirical-Bayes rate shrinkage (beta-binomial, method of
    moments — public technique): fit Beta(α, β) to the observed
    per-key rates, then shrink each key toward the prior mean in
    proportion to its evidence:

        α+β from  μ(1−μ)/v − 1,   shrunk = (h + α)/(t + α + β)

    — small-sample keys pull hard toward the global rate, large keys
    barely move: the standard fix for "tiny group tops the leaderboard
    with 1/1". Input is the caller's per-key (hits, trials) rollup.

    Exactness: raw rates are exact BIGINT rationals; μ and v come
    from det-quantized sums over the ≤|keys| rollup; α/β/shrunk are
    fixed double expressions broadcast back. NULL α/β (degenerate
    variance) passes raw rates through. Returns one row per key:
    (keys..., hits, trials, raw_rate, alpha, beta, shrunk_rate) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    keys = list(key_cols)
    h = F.col(hits_col).cast("double")
    t = F.col(trials_col).cast("double")
    r = h / t
    base = df.filter(F.col(trials_col) > 0).select(
        *keys, F.col(hits_col).cast("bigint").alias("hits"),
        F.col(trials_col).cast("bigint").alias("trials"),
        r.alias("_r"))
    m = F.broadcast(base.agg(
        F.count("*").alias("_k"),
        det_sum(F.col("_r")).alias("_sr"),
        det_sum(F.col("_r") * F.col("_r")).alias("_srr")))
    kd = F.col("_k").cast("double")
    mu = F.col("_sr") / kd
    v = F.col("_srr") / kd - mu * mu
    good = (v > 0) & (mu * (F.lit(1.0) - mu) > v)
    ab = mu * (F.lit(1.0) - mu) / v - F.lit(1.0)
    alpha = F.when(good, mu * ab)
    beta = F.when(good, (F.lit(1.0) - mu) * ab)
    hd = F.col("hits").cast("double")
    td = F.col("trials").cast("double")
    shrunk = F.when(good, (hd + alpha) / (td + alpha + beta)) \
        .otherwise(hd / td)
    return (base.crossJoin(m)
            .select(*keys, "hits", "trials",
                    F.round(hd / td, 6).alias("raw_rate"),
                    F.round(alpha, 6).alias("alpha"),
                    F.round(beta, 6).alias("beta"),
                    F.round(shrunk, 6).alias("shrunk_rate")))


def wasserstein_1d(df: DataFrame, group_col: str, value_col: str,
                   group_a, group_b) -> DataFrame:
    """One-dimensional Wasserstein-1 (earth-mover) distance between
    two groups' value distributions (public formula) — the
    VALUE-SCALED drift number ("how far did the distribution move, in
    the metric's own units") where PSI/JSD are dimensionless and CvM
    is rank-scaled:

        W1 = ∫ |F_a(x) − F_b(x)| dx
           = Σ_support gap_to_next(x) · |F_a(x) − F_b(x)|

    Collapsed-support construction: one hash agg to per-value counts,
    one ordered window for the exact BIGINT ECDF rationals and the
    lead-value gap, det-quantized |ΔF|·Δx addends. One row:
    (n_a, n_b, w1_distance) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    counts = (df.filter((in_a | in_b) & F.col(value_col).isNotNull())
              .groupBy(F.col(value_col).alias("_v"))
              .agg(F.sum(in_a.cast("long")).alias("_ca"),
                   F.sum(in_b.cast("long")).alias("_cb")))
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import (global_cumsum,
                                                      global_shift)
    # distributed ECDF cumsums + distributed lead for the support gap
    # — no SinglePartition exchange on the value support
    cc = global_shift(global_cumsum(counts, ["_v"], ["_ca", "_cb"]),
                      ["_v"], ["_v"], offset=1)
    tots = F.broadcast(cc.agg(F.max("_cum__ca").alias("_na"),
                              F.max("_cum__cb").alias("_nb")))
    gap = (F.col("_lead__v").cast("double")
           - F.col("_v").cast("double"))
    dfq = (F.col("_cum__ca").cast("double") / F.col("_na").cast("double")
           - F.col("_cum__cb").cast("double") / F.col("_nb").cast("double"))
    addend = F.when(gap.isNotNull(), gap * F.abs(dfq)) \
        .otherwise(F.lit(0.0))
    agg = (cc.crossJoin(tots)
           .select(F.col("_na"), F.col("_nb"), addend.alias("_w"))
           .agg(F.max("_na").alias("n_a"), F.max("_nb").alias("n_b"),
                det_sum(F.col("_w")).alias("_s")))
    return track(agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                       F.col("_s")), 6).alias("w1_distance")), cc)


def cuped_adjusted_means(df: DataFrame, group_col: str,
                         pre_units: str, post_units: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013,
    public formula): adjust each arm's post-period mean by its
    pre-period imbalance, using the pooled regression coefficient

        κ = cov(x, y) / var(x),
        adj_g = ȳ_g − κ·(x̄_g − x̄)

    — the industry-standard way to cut A/B variance with pre-exposure
    data, turning week-long experiments into day-long ones. Inputs
    are integer-unit per-subject (pre, post) columns.

    Exactness: one DECIMAL(38,0) moment aggregation (pooled) + one
    per-arm integer rollup; κ and the adjustments are fixed double
    expressions. Returns one row per arm: (group, n, mean_pre,
    mean_post, kappa, adjusted_mean) @6dp; κ NULL (adjustment = raw
    mean) when var(x) = 0.
    """
    d38 = "decimal(38,0)"
    x = F.col(pre_units).cast(d38)
    y = F.col(post_units).cast(d38)
    pooled = F.broadcast(df.agg(
        F.count("*").alias("_n"),
        F.sum(x).cast(d38).alias("_sx"),
        F.sum(y).cast(d38).alias("_sy"),
        F.sum((x * x).cast(d38)).cast(d38).alias("_sxx"),
        F.sum((x * y).cast(d38)).cast(d38).alias("_sxy")))
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(x).cast(d38).alias("_gx"),
        F.sum(y).cast(d38).alias("_gy"))
    n = F.col("_n").cast(d38)
    var_x = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    kappa = F.when(
        var_x > 0,
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        .cast("double") / var_x.cast("double"))
    mean_x_all = (F.col("_sx").cast("double")
                  / F.col("_n").cast("double"))
    gx = F.col("_gx").cast("double") / F.col("n").cast("double")
    gy = F.col("_gy").cast("double") / F.col("n").cast("double")
    adj = F.when(kappa.isNotNull(),
                 gy - kappa * (gx - mean_x_all)).otherwise(gy)
    # pin_round6: the arm means are exact integer ratios — the
    # .5e-6-tie class (functions/numeric.py)
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    return (per.crossJoin(pooled)
            .select("grp", F.col("n").cast("bigint").alias("n"),
                    pin_round6(gx).alias("mean_pre"),
                    pin_round6(gy).alias("mean_post"),
                    pin_round6(kappa).alias("kappa"),
                    pin_round6(adj).alias("adjusted_mean")))


def diff_in_diff(df: DataFrame, group_col: str, period_col: str,
                 units_col: str, treat, control,
                 pre, post) -> DataFrame:
    """Two-by-two difference-in-differences estimator (public
    formula) — the observational companion to the randomized CUPED
    readout: how much more did the treated arm move than the control
    arm moved on its own?

        DiD = (ȳ_treat,post − ȳ_treat,pre)
            − (ȳ_ctrl,post − ȳ_ctrl,pre)
        SE  = √(Σ_cells s²_cell/n_cell)     (unpooled, Welch-style)

    One conditional DECIMAL(38,0) moment aggregation produces all
    four cells; means/variances/DiD/SE/z are fixed double
    expressions. One row: (n_tp, n_tr, n_cp, n_cr, did, se, z_stat)
    @6dp — cell suffixes t/c × r(pre)/p(post).
    """
    d38 = "decimal(38,0)"
    u = F.col(units_col).cast(d38)
    cells = {
        "tp": (F.col(group_col) == F.lit(treat))
        & (F.col(period_col) == F.lit(post)),
        "tr": (F.col(group_col) == F.lit(treat))
        & (F.col(period_col) == F.lit(pre)),
        "cp": (F.col(group_col) == F.lit(control))
        & (F.col(period_col) == F.lit(post)),
        "cr": (F.col(group_col) == F.lit(control))
        & (F.col(period_col) == F.lit(pre)),
    }
    aggs = []
    for k, cond in cells.items():
        aggs += [
            F.sum(cond.cast("long")).cast(d38).alias(f"_n{k}"),
            F.sum(F.when(cond, u).otherwise(F.lit(0)).cast(d38))
            .cast(d38).alias(f"_s{k}"),
            F.sum(F.when(cond, (u * u).cast(d38)).otherwise(F.lit(0))
                  .cast(d38)).cast(d38).alias(f"_q{k}")]
    m = df.filter(F.col(units_col).isNotNull()).agg(*aggs)

    def mean(k):
        return (F.col(f"_s{k}").cast("double")
                / F.col(f"_n{k}").cast("double"))

    def var_over_n(k):
        n = F.col(f"_n{k}")
        sv = ((n * F.col(f"_q{k}") - F.col(f"_s{k}") * F.col(f"_s{k}"))
              .cast("double") / (n * (n - 1)).cast("double"))
        return sv / n.cast("double")

    ok = None
    for k in cells:
        c = F.col(f"_n{k}") > 1
        ok = c if ok is None else (ok & c)
    did = (mean("tp") - mean("tr")) - (mean("cp") - mean("cr"))
    se = F.sqrt(var_over_n("tp") + var_over_n("tr")
                + var_over_n("cp") + var_over_n("cr"))
    return m.select(
        F.col("_ntp").cast("bigint").alias("n_tp"),
        F.col("_ntr").cast("bigint").alias("n_tr"),
        F.col("_ncp").cast("bigint").alias("n_cp"),
        F.col("_ncr").cast("bigint").alias("n_cr"),
        F.round(F.when(ok, did), 6).alias("did"),
        F.round(F.when(ok, se), 6).alias("se"),
        F.round(F.when(ok & (se > 0), did / se), 6).alias("z_stat"))


def breusch_pagan(df: DataFrame, t_col: str,
                  units_col: str) -> DataFrame:
    """Breusch-Pagan heteroskedasticity screen for the series' OLS
    trend (public formula, Koenker's studentized form): regress the
    squared residuals on t; BP = n·R² (~χ²₁) — "is the noise level
    itself trending?", the check `durbin_watson`'s serial-correlation
    lens misses.

    The OLS fit reuses the exact DECIMAL moment construction
    (`durbin_watson`); residual squares are fixed IEEE expressions
    det-quantized at 1e-6 units into the second-stage moments
    (Σg, Σg², Σt·g with g = e²); R² is one closed-form double
    expression. One row: (n, r_squared, bp_stat) @6dp; NULL when
    var(t) or var(g) is 0.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum_big

    d38 = "decimal(38,0)"
    t = F.col(t_col).cast(d38)
    y = F.col(units_col).cast(d38)
    m = F.broadcast(df.agg(
        F.count("*").alias("_n"),
        F.sum(t).cast(d38).alias("_st"),
        F.sum(y).cast(d38).alias("_sy"),
        F.sum((t * t).cast(d38)).cast(d38).alias("_stt"),
        F.sum((t * y).cast(d38)).cast(d38).alias("_sty")))
    n = F.col("_n").cast(d38)
    b = ((n * F.col("_sty") - F.col("_st") * F.col("_sy"))
         .cast("double")
         / (n * F.col("_stt") - F.col("_st") * F.col("_st"))
         .cast("double"))
    a = ((F.col("_sy").cast("double")
          - b * F.col("_st").cast("double"))
         / F.col("_n").cast("double"))
    e = (F.col(units_col).cast("double")
         - (a + b * F.col(t_col).cast("double")))
    g = e * e
    # det_sum_big: the g² addends are e⁴-magnitude, so the quantized
    # units exceed BIGINT-sum headroom on long series — DECIMAL(38,0)
    # accumulation keeps the sums exact (functions/numeric.py)
    scale = 1_000_000
    agg = (df.crossJoin(m)
           .agg(F.max("_n").alias("n"),
                F.max(F.col("_st").cast("double")).alias("_std"),
                F.max(F.col("_stt").cast("double")).alias("_sttd"),
                det_sum_big(g, scale).alias("_sg"),
                det_sum_big(g * g, scale).alias("_sgg"),
                det_sum_big(F.col(t_col).cast("double") * g, scale)
                .alias("_stg")))
    nd = F.col("n").cast("double")
    cov = nd * F.col("_stg") - F.col("_std") * F.col("_sg")
    var_t = nd * F.col("_sttd") - F.col("_std") * F.col("_std")
    var_g = nd * F.col("_sgg") - F.col("_sg") * F.col("_sg")
    ok = (var_t > 0) & (var_g > 0)
    r2 = cov * cov / (var_t * var_g)
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.when(ok, r2), 6).alias("r_squared"),
        F.round(F.when(ok, nd * r2), 6).alias("bp_stat"))


def negative_binomial_fit(df: DataFrame, count_col: str,
                          key_cols: list[str] | None = None) -> DataFrame:
    """Method-of-moments negative-binomial fit per key over a count
    rollup (public formulas) — the MODEL half of `dispersion_index`'s
    screen: once VMR > 1 says "not Poisson", NB(r, p) is the standard
    overdispersed replacement (burst modeling, demand simulation):

        r̂ = μ² / (s² − μ),   p̂ = μ / s²     (requires s² > μ)

    Exact DECIMAL(38,0) integer moments (same aggregation as the
    dispersion screen), sample variance, fixed double closed forms.
    Returns (keys..., n, mean, var, nb_r, nb_p) @6dp; NULL fit when
    the data is under-dispersed (s² ≤ μ) or n < 2.
    """
    keys = list(key_cols or [])
    d38 = "decimal(38,0)"
    c = F.col(count_col).cast(d38)
    agg = df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(c).cast(d38).alias("_s"),
        F.sum((c * c).cast(d38)).cast(d38).alias("_q"))
    n = F.col("n").cast(d38)
    mean = F.col("_s").cast("double") / F.col("n").cast("double")
    svar = ((n * F.col("_q") - F.col("_s") * F.col("_s"))
            .cast("double") / (n * (n - 1)).cast("double"))
    good = (F.col("n") > 1) & (svar > mean) & (mean > 0)
    return agg.select(
        *keys, F.col("n").cast("bigint").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(F.when(F.col("n") > 1, svar), 6).alias("var"),
        F.round(F.when(good, mean * mean / (svar - mean)), 6)
        .alias("nb_r"),
        F.round(F.when(good, mean / svar), 6).alias("nb_p"))


def gesd_outliers(df: DataFrame, t_col: str, units_col: str,
                  k: int = 3) -> DataFrame:
    """Generalized extreme studentized deviate (Rosner's GESD, public
    formula) — ``k`` unrolled rounds of "compute mean/sd over the
    REMAINING points, report and remove the most extreme one": the
    masking-proof multi-outlier screen a single Grubbs pass misses
    (two adjacent spikes hide each other by inflating s).

    Each round is one exact DECIMAL(38,0) moment aggregation
    broadcast back, one fixed studentized-deviation expression, one
    order-free max(struct) argmax (ties: larger value, then later t),
    and one key anti-filter — no double accumulation anywhere, so no
    quantization is even needed. Zero-variance rounds emit nothing
    (deviations undefined). Returns ≤k rows:
    (round, t_removed, value_removed, r_stat) @6dp.
    """
    d38 = "decimal(38,0)"
    remaining = df.select(F.col(t_col).alias("_t"),
                          F.col(units_col).alias("_u"))
    outs = []
    for j in range(1, int(k) + 1):
        u = F.col("_u").cast(d38)
        m = F.broadcast(remaining.agg(
            F.count("*").alias("_n"),
            F.sum(u).cast(d38).alias("_s"),
            F.sum((u * u).cast(d38)).cast(d38).alias("_q")))
        n = F.col("_n").cast(d38)
        mu = F.col("_s").cast("double") / F.col("_n").cast("double")
        sd = F.sqrt((n * F.col("_q") - F.col("_s") * F.col("_s"))
                    .cast("double")
                    / (n * (n - 1)).cast("double"))
        dev = F.when((F.col("_n") > 2) & (sd > 0),
                     F.abs(F.col("_u").cast("double") - mu) / sd)
        scored = (remaining.crossJoin(m)
                  .select("_t", "_u", dev.alias("_d"))
                  .filter(F.col("_d").isNotNull()))
        top = F.broadcast(scored.agg(
            F.max(F.struct(F.col("_d").alias("d"),
                           F.col("_u").alias("u"),
                           F.col("_t").alias("t"))).alias("_m")))
        outs.append(top.select(
            F.lit(j).alias("round"),
            F.col("_m.t").alias("t_removed"),
            F.col("_m.u").alias("value_removed"),
            F.round(F.col("_m.d"), 6).alias("r_stat"))
            .filter(F.col("r_stat").isNotNull()))
        remaining = (remaining.crossJoin(top)
                     .filter(F.col("_t") != F.col("_m.t"))
                     .select("_t", "_u"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def brown_forsythe(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test for equal
    variances across groups (public formula) — the assumption check
    in FRONT of `one_way_anova` (whose F inflates under unequal
    spreads), robust to non-normality because centers are medians:

        W = one-way ANOVA F on z_gi = |x_gi − median_g|

    Group medians are the exact interpolated percentile(0.5) (the
    same engine-portable definition every quantile query here uses),
    broadcast back; the deviations feed the det-quantized ANOVA
    moments. Output = the ANOVA row over deviations:
    (n_rows, n_groups, f_stat, eta_sq, ss_between, ss_within) @6dp.
    """
    med = (df.filter(F.col(value_col).isNotNull()
                     & F.col(group_col).isNotNull())
           .groupBy(group_col)
           .agg(F.expr(f"percentile({value_col}, 0.5)")
                .alias("_med")))
    dev = (df.join(F.broadcast(med), group_col)
           .select(F.col(group_col),
                   F.abs(F.col(value_col) - F.col("_med"))
                   .alias("_dev")))
    return one_way_anova(dev, group_col, "_dev")


def mcnemar_test(df: DataFrame, pred_a, pred_b, truth) -> DataFrame:
    """McNemar's paired-classifier test (public formula) — "do two
    rules disagree more in one direction than the other on the SAME
    examples?", the right comparison when accuracies come from paired
    predictions (a two-proportion z on the marginals is wrong there):

        chi2 = (b − c)² / (b + c)

    with b = A-right/B-wrong and c = A-wrong/B-right discordant
    counts (continuity correction left off; both engines identical).
    Pass boolean Column expressions. Exact integers end-to-end; one
    conditional aggregation. One row: (n, both_right, both_wrong,
    only_a, only_b, chi2) @6dp; NULL chi2 when b + c = 0.
    """
    a_ok = (pred_a == truth).cast("long")
    b_ok = (pred_b == truth).cast("long")
    m = df.agg(
        F.count("*").alias("n"),
        F.sum(a_ok * b_ok).alias("both_right"),
        F.sum((1 - a_ok) * (1 - b_ok)).alias("both_wrong"),
        F.sum(a_ok * (1 - b_ok)).alias("only_a"),
        F.sum((1 - a_ok) * b_ok).alias("only_b"))
    b = F.col("only_a").cast("double")
    c = F.col("only_b").cast("double")
    chi2 = F.when(F.col("only_a") + F.col("only_b") > 0,
                  (b - c) * (b - c) / (b + c))
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("both_right").cast("bigint").alias("both_right"),
        F.col("both_wrong").cast("bigint").alias("both_wrong"),
        F.col("only_a").cast("bigint").alias("only_a"),
        F.col("only_b").cast("bigint").alias("only_b"),
        F.round(chi2, 6).alias("chi2"))


def mood_median_test(df: DataFrame, group_col: str,
                     value_col: str) -> DataFrame:
    """Mood's median test (public formula) — "do the groups share a
    median?": classify every value against the GLOBAL exact
    interpolated median, drop ties (the standard convention), and run
    the chi-square independence test on the k×2 (group, above/below)
    table. The crudest-but-most-robust k-group location test — keeps
    its nerve under heavy tails where ANOVA and even Kruskal-Wallis
    lose power to outlier leverage.

    One global percentile (broadcast row), one conditional flag, then
    `quality/profile.chi2_independence`'s det-quantized cell fold.
    Output = the chi2 row: (n_rows, n_a, n_b, dof, chi2, cramers_v)
    — n_a = groups, n_b = 2 sides.
    """
    from pipelines_rj_sms_spark.quality.profile import (
        chi2_independence)

    med = F.broadcast(
        df.filter(F.col(value_col).isNotNull())
        .agg(F.expr(f"percentile({value_col}, 0.5)").alias("_med")))
    flagged = (df.crossJoin(med)
               .filter(F.col(value_col).isNotNull()
                       & (F.col(value_col) != F.col("_med")))
               .select(F.col(group_col),
                       F.when(F.col(value_col) > F.col("_med"),
                              F.lit("above")).otherwise(F.lit("below"))
                       .alias("_side")))
    return chi2_independence(flagged, group_col, "_side")


def winsorize_column(df: DataFrame, id_col: str, value_col: str,
                     lower: float = 0.05, upper: float = 0.95,
                     out_col: str = "clipped",
                     approx: bool = False,
                     approx_accuracy: int = 10000) -> DataFrame:
    """Winsorize ``value_col`` to its corpus-wide [lower, upper]
    quantiles: (id, out_col) with out_col = round(clip(v, lo, hi), 6)
    — the standard robust-stats tail clamp before moment-based
    modeling (public method).

    Scale shape: ONE percentile aggregation whose (lo, hi) row rides
    back broadcast; clipping is a codegen'd projection — the facts
    never shuffle. ``approx``: the exact ``percentile`` default (the
    oracle/replay contract) buffers EVERY DISTINCT value of the
    column in its final aggregator — bounded for fixed-point prices,
    ~|rows| for a continuous column, where it will not survive 100x
    scale; ``approx=True`` swaps in ``approx_percentile`` (bounded
    sketch, rank error <= 1/``approx_accuracy``), moving each clamp
    threshold by at most the rank error; opt-in because the result
    is then not bit-replayable cross-engine.
    """
    pcts = (f"approx_percentile({value_col}, array({lower}, {upper}), "
            f"{approx_accuracy})" if approx
            else f"percentile({value_col}, array({lower}, {upper}))")
    b = F.broadcast(df.agg(
        F.element_at(F.expr(pcts), 1).alias("_lo"),
        F.element_at(F.expr(pcts), 2).alias("_hi")))
    return (df.crossJoin(b)
            .select(F.col(id_col),
                    F.round(F.least(F.greatest(F.col(value_col),
                                               F.col("_lo")),
                                    F.col("_hi")), 6).alias(out_col)))


def mad_outlier_flags(df: DataFrame, id_col: str, value_col: str,
                      k: float = 3.0, consistency: float = 1.4826,
                      out_col: str = "is_outlier",
                      approx: bool = False,
                      approx_accuracy: int = 10000) -> DataFrame:
    """Median-absolute-deviation outlier screen: flag rows where
    |v - median| > k * 1.4826 * MAD (the Gaussian-consistent robust
    z-score, public method — the screen that, unlike mean/stddev,
    cannot be dragged by the outliers it is hunting).

    Scale shape: two percentile aggregations (median, then MAD over
    the |v - med| projection), each a 1-row broadcast; the flag is a
    codegen'd projection, facts never shuffle. ``approx``: exact
    ``percentile`` (default — oracle contract) buffers every distinct
    value of the column per aggregation, ~|rows| for continuous
    metrics; ``approx=True`` uses ``approx_percentile`` (bounded
    sketch, rank error <= 1/``approx_accuracy``) for both medians —
    the flag then moves only for rows within the rank-error band of
    the cut; opt-in, not bit-replayable.
    """
    def _med(col: str) -> Column:
        return (F.expr(f"approx_percentile({col}, 0.5, "
                       f"{approx_accuracy})") if approx
                else F.expr(f"percentile({col}, 0.5)"))

    med = F.broadcast(df.agg(_med(value_col).alias("_med")))
    dev = (df.crossJoin(med)
           .select(F.col(id_col), F.col(value_col), F.col("_med"),
                   F.abs(F.col(value_col) - F.col("_med")).alias("_ad")))
    mad = F.broadcast(dev.agg(_med("_ad").alias("_mad")))
    return (dev.crossJoin(mad)
            .select(F.col(id_col),
                    (F.col("_ad") > F.lit(k) * F.lit(consistency)
                     * F.col("_mad")).alias(out_col)))
