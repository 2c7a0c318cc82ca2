"""Supervised categorical feature encoding (target / impact encoding).

The training-data side of the house (dedup, sampling, splits —
functions/sampling.py) feeds models whose tabular features need the
standard high-cardinality-categorical treatment: replace the category
with a statistic of the training target over that category. The naive
mean leaks the row's own label into its feature; the two public fixes
are leave-one-out (drop the row's own target from its category mean)
and K-fold (encode each fold with statistics fitted on the others) —
both implemented here, exactly, with the same leakage discipline as
``sampling.hash_split`` (fold/key-based, replayable).

Scale shape: one hash aggregation collapses the data to per-category
(or per category x fold) sufficient statistics — map-side combine makes
the shuffle proportional to the CATEGORY cardinality, not the data —
and the statistics join back. With ``broadcast_stats=True`` (default)
the join is a broadcast hash join and the fact rows never shuffle at
all; switch it off for category cardinalities that don't fit a
broadcast (the join then shuffles on the category key, still one
Exchange of narrow rows).

Determinism: the target is quantized to fixed-point units once
(``det_units`` — functions/numeric.py), so every sum is an exact
BIGINT and the encoded value is an exact rational divided out in one
IEEE operation — identical under any partitioning and bit-identical
to the DuckDB oracle mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.numeric import det_units

__all__ = ["target_encode_loo", "target_encode_kfold"]


def target_encode_loo(df: DataFrame, category_col: str, target_col: str,
                      out_col: str = "te_loo", scale: int = 100,
                      broadcast_stats: bool = True) -> DataFrame:
    """Leave-one-out target encoding:

        enc_i = (sum(target over category) - target_i) / (n_category - 1)

    For singleton categories (n == 1) the row's own target is the whole
    category and LOO is undefined — those rows fall back to the GLOBAL
    mean with the row's own target removed, (S - y_i) / (N - 1), the
    same statistic at the coarsest grain (keeps the no-self-leakage
    guarantee instead of silently leaking via a plain global mean).

    ``scale`` quantizes the target (default 100 = money cents); pick it
    so |target| * scale < 2**53 and the per-category sum < 2**63
    (functions/numeric.py capacity rule). Output rounds to 6 decimals.
    """
    base = df.withColumn("_y_units", det_units(F.col(target_col), scale))
    stats = (base.groupBy(category_col)
             .agg(F.sum("_y_units").alias("_s_units"),
                  F.count("*").alias("_n_cat")))
    if broadcast_stats:
        stats = F.broadcast(stats)
    glob = F.broadcast(base.agg(
        F.sum("_y_units").alias("_s_all"),
        F.count("*").alias("_n_all")))
    loo = F.when(
        F.col("_n_cat") > 1,
        (F.col("_s_units") - F.col("_y_units")).cast("double")
        / (F.col("_n_cat") - 1)
    ).otherwise(
        (F.col("_s_all") - F.col("_y_units")).cast("double")
        / (F.col("_n_all") - 1))
    return (base.join(stats, category_col).crossJoin(glob)
            .withColumn(out_col,
                        F.round(loo / F.lit(float(scale)), 6))
            .drop("_y_units", "_s_units", "_n_cat", "_s_all", "_n_all"))


def target_encode_kfold(df: DataFrame, category_col: str,
                        target_col: str, fold_col: str,
                        out_col: str = "te_kfold", scale: int = 100,
                        broadcast_stats: bool = True) -> DataFrame:
    """K-fold target encoding: rows in fold f are encoded with the
    category's target mean computed over the OTHER folds,

        enc = (S_cat - S_cat_fold) / (n_cat - n_cat_fold)

    — the cross-fit construction that pairs with
    ``sampling.kfold_assign`` (pass its fold column). Categories whose
    rows all sit in one fold have no out-of-fold evidence; they fall
    back to the global out-of-fold mean (S - S_fold) / (N - n_fold).

    Statistics: ONE (category, fold) hash aggregation; per-category
    totals come from a second aggregation OVER THE COLLAPSED rollup
    (at most |categories| x k rows — never the data), same discipline
    as quality/profile.py's margin windows.
    """
    base = df.withColumn("_y_units", det_units(F.col(target_col), scale))
    cf = (base.groupBy(category_col, fold_col)
          .agg(F.sum("_y_units").alias("_s_cf"),
               F.count("*").alias("_n_cf")))
    cat = (cf.groupBy(category_col)
           .agg(F.sum("_s_cf").alias("_s_cat"),
                F.sum("_n_cf").alias("_n_cat")))
    stats = cf.join(cat, category_col)
    if broadcast_stats:
        stats = F.broadcast(stats)
    fold_tot = (cf.groupBy(fold_col)
                .agg(F.sum("_s_cf").alias("_s_f"),
                     F.sum("_n_cf").alias("_n_f")))
    glob = F.broadcast(fold_tot.crossJoin(
        cat.agg(F.sum("_s_cat").alias("_s_all"),
                F.sum("_n_cat").alias("_n_all"))))
    oof_n = F.col("_n_cat") - F.col("_n_cf")
    oof = F.when(
        oof_n > 0,
        (F.col("_s_cat") - F.col("_s_cf")).cast("double") / oof_n
    ).otherwise(
        (F.col("_s_all") - F.col("_s_f")).cast("double")
        / (F.col("_n_all") - F.col("_n_f")))
    return (base
            .join(stats, [category_col, fold_col])
            .join(glob, fold_col)
            .withColumn(out_col, F.round(oof / F.lit(float(scale)), 6))
            .drop("_y_units", "_s_cf", "_n_cf", "_s_cat", "_n_cat",
                  "_s_f", "_n_f", "_s_all", "_n_all"))


def quantile_normalize(df: DataFrame, group_col: str, value_col: str,
                       out_col: str = "q_norm") -> DataFrame:
    """Quantile normalization: map each group's value distribution onto
    the GLOBAL (pooled) distribution — the classic cross-source feature
    alignment (microarray "quantile normalization", public method, here
    in its nearest-rank form): a value at within-group mid-quantile
    q = (rank − 0.5) / n_g is replaced by the pooled distribution's
    order statistic at position ceil(q·N).

    Entirely exact: within-group average ranks use the half-unit
    construction (``quality/profile.spearman_correlation``), the target
    position is integer ceil-division (SQL ``div`` — never a double),
    and the output is an ORIGINAL data value — the whole operator has
    no floating-point arithmetic to drift.

    Scale shape: both rank computations collapse to per-(group, value)
    and per-value counts first (two hash aggs); the order-statistic
    lookup is a union of the collapsed query and lookup rows with ONE
    forward-looking window over it ("next lookup at position ≥ k" —
    the sort-merge interval-lookup trick, no non-equi join); the final
    map back to rows is an equi-join on (group, value). Windows only
    ever see collapsed supports, never the data. Capacity: positions
    multiply up to (2·n_g)·N — exact in BIGINT to ~2e9 rows; beyond
    that swap the position arithmetic to DECIMAL(38,0).

    Rows with NULL values keep NULL in ``out_col``.
    """
    from pyspark.sql import Window

    vtype = dict((f.name, f.dataType.simpleString())
                 for f in df.schema.fields)[value_col]
    base = (df.filter(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("_g"),
                    F.col(value_col).alias("_v")))
    # the collapsed (group, value) rollup feeds the per-group ranks,
    # the total-count scalar AND the pooled support. Persist EAGERLY
    # (count() before any consumer): the total-count broadcast and the
    # range-partitioner SAMPLING jobs of the two global windows are
    # separate concurrent jobs, and with a lazy cache each raced the
    # not-yet-built cache and re-derived the rollup from source
    # (profiled: three near-identical full-compute stages). An A/B vs
    # localCheckpoint kept the columnar InMemoryRelation as the faster
    # materialization (3.07 s vs 5.71 s at sf0.1).
    gv = base.groupBy("_g", "_v").agg(F.count("*").alias("_ct")) \
        .persist()
    gv.count()
    wg = (Window.partitionBy("_g").orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, 0))
    wgt = Window.partitionBy("_g")
    tot = F.broadcast(gv.agg(F.sum("_ct").alias("_n")))
    ranked = (gv
              .withColumn("_cum", F.sum("_ct").over(wg))
              .withColumn("_ng", F.sum("_ct").over(wgt))
              .crossJoin(tot)
              # r2 = 2*avg_rank in half-units; k = ceil(q*N) with
              # q = (r2-1)/(2*ng), all-integer ceil division
              .withColumn("_r2", 2 * F.col("_cum") - F.col("_ct") + 1)
              .withColumn("_num", (F.col("_r2") - 1) * F.col("_n")
                          + 2 * F.col("_ng") - 1)
              .withColumn("_k", F.greatest(
                  F.lit(1).cast("long"),
                  F.expr("_num div (2 * _ng)"))))
    from pipelines_rj_sms_spark.operators.ids import (global_cumsum,
                                                      global_running_last)
    glob0 = global_cumsum(gv.groupBy("_v").agg(F.sum("_ct").alias("_ct")),
                          ["_v"], ["_ct"])
    # keep glob0 (direct helper return) for track() — withColumn drops
    # the attr chain global_cumsum attached
    glob = glob0.withColumn("_pos", F.col("_cum__ct"))
    lookups = glob.select(
        F.col("_pos"), F.lit(1).alias("_lk"),
        F.col("_v").alias("_tgt"))
    queries_ = ranked.select(
        F.col("_g"), F.col("_v"),
        F.col("_k").alias("_pos"), F.lit(0).alias("_lk"),
        F.lit(None).cast(vtype).alias("_tgt"))
    unioned = queries_.unionByName(lookups, allowMissingColumns=True)
    # first lookup value at position >= k == running last-non-null
    # over the DESCENDING order (the sort-merge interval-lookup trick;
    # forward first() recomputes its frame per row, O(support²)).
    # Spelled as global_running_last over the NEGATED keys — a
    # distributed two-phase running window, no SinglePartition
    # exchange even when the pooled support approaches data size.
    # At equal position the lookup sorts before the query in the
    # reversed order, so k == cum still resolves to that value.
    shifted = global_running_last(
        unioned.withColumn("_npos", -F.col("_pos"))
        .withColumn("_nlk", -F.col("_lk")),
        ["_npos", "_nlk"], "_tgt", "_mapped")
    mapping = (shifted
               .filter(F.col("_lk") == 0)
               .select(F.col("_g"), F.col("_v"),
                       F.col("_mapped").alias(out_col)))
    from pipelines_rj_sms_spark.operators.cache import track
    return track(df.join(mapping,
                         (F.col(group_col) == mapping["_g"])
                         & (F.col(value_col) == mapping["_v"]),
                         "left")
                 .drop("_g", "_v"), gv, glob0, shifted)


def ridge_regression_2f(df: DataFrame, x1_units: str, x2_units: str,
                        y_units: str, lam: float = 1.0) -> DataFrame:
    """Closed-form ridge regression with two features + intercept —
    the simplest useful "fit a model IN the engine" primitive
    (feature-importance screens, drift-adjusted baselines) solved
    exactly from sufficient statistics, no iteration (public normal-
    equations algebra).

    Inputs are integer-unit columns (callers det-quantize doubles
    first), so the eight moments n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2²,
    Σx1y, Σx2y are EXACT integers accumulated in DECIMAL(38,0) — one
    hash aggregation over the facts, map-side combined, any partition
    order. Centering happens algebraically (A = n·Σxx − Σx·Σx etc.,
    the n²-covariance trick), and the ridge-damped 2×2 system

        (A + n·λI)·b = c,   intercept = (Σy − b·Σx)/n

    is solved by the explicit 2×2 inverse in ONE fixed double
    expression over those exact integers — deterministic, and
    bit-identical to the oracle spelling the same expression.
    Coefficients are in UNIT space (per-unit-of-x per unit-of-y);
    ``lam`` is in squared-unit metric (λ=0 gives OLS). Returns one row
    (n, coef_x1, coef_x2, intercept) rounded to 6; NULL coefficients
    when the damped system is singular (det = 0 — constant features
    with λ=0).
    """
    d38 = "decimal(38,0)"
    x1 = F.col(x1_units).cast(d38)
    x2 = F.col(x2_units).cast(d38)
    y = F.col(y_units).cast(d38)
    m = df.agg(
        F.count("*").alias("n"),
        F.sum(x1).cast(d38).alias("_s1"),
        F.sum(x2).cast(d38).alias("_s2"),
        F.sum(y).cast(d38).alias("_sy"),
        F.sum((x1 * x1).cast(d38)).cast(d38).alias("_s11"),
        F.sum((x1 * x2).cast(d38)).cast(d38).alias("_s12"),
        F.sum((x2 * x2).cast(d38)).cast(d38).alias("_s22"),
        F.sum((x1 * y).cast(d38)).cast(d38).alias("_s1y"),
        F.sum((x2 * y).cast(d38)).cast(d38).alias("_s2y"))
    n = F.col("n").cast(d38)
    a11 = (n * F.col("_s11") - F.col("_s1") * F.col("_s1"))
    a12 = (n * F.col("_s12") - F.col("_s1") * F.col("_s2"))
    a22 = (n * F.col("_s22") - F.col("_s2") * F.col("_s2"))
    c1 = (n * F.col("_s1y") - F.col("_s1") * F.col("_sy"))
    c2 = (n * F.col("_s2y") - F.col("_s2") * F.col("_sy"))
    nd = F.col("n").cast("double")
    m11 = a11.cast("double") + nd * F.lit(float(lam))
    m22 = a22.cast("double") + nd * F.lit(float(lam))
    m12 = a12.cast("double")
    det = m11 * m22 - m12 * m12
    b1 = (c1.cast("double") * m22 - c2.cast("double") * m12) / det
    b2 = (c2.cast("double") * m11 - c1.cast("double") * m12) / det
    icept = (F.col("_sy").cast("double") - b1 * F.col("_s1")
             .cast("double") - b2 * F.col("_s2").cast("double")) / nd
    ok = det != F.lit(0.0)
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.when(ok, b1), 6).alias("coef_x1"),
        F.round(F.when(ok, b2), 6).alias("coef_x2"),
        F.round(F.when(ok, icept), 6).alias("intercept"))


def split_conformal_2f(df: DataFrame, x1_units: str, x2_units: str,
                       y_units: str, key_cols: list[str],
                       alpha: float = 0.1, fit_pct: int = 60,
                       lam: float = 1.0, salt: str = "conf",
                       resid_scale: int = 1000) -> DataFrame:
    """Split-conformal prediction intervals around the closed-form
    ridge fit — the distribution-free "±how much" guarantee modern ML
    pipelines attach to point predictions (public method: split the
    data, fit on one part, take the ⌈(n_cal+1)(1−α)⌉-th smallest
    absolute calibration residual as the interval half-width;
    coverage ≥ 1−α on exchangeable data, no normality assumption).

    Determinism end-to-end: the fit/calibration split is the repo's
    replayable md5 hash bucket (same rows land the same side in any
    engine); the fit is :func:`ridge_regression_2f`'s exact-moment
    closed form (identical coefficient doubles); residuals are
    quantized to 1/``resid_scale`` units (floor(x·s + 0.5), exact
    IEEE, identical in both engines) so the order statistic runs over
    an INTEGER support — the k-th smallest is the first support value
    whose cumulative count reaches k, one cumulative window over the
    COLLAPSED residual support (the quantile-norm interval-lookup
    posture — never a sort of the calibration rows).

    Returns one row (n_fit, n_cal, k, coef_x1, coef_x2, intercept,
    q_hat): q_hat is the interval half-width in y units; NULL when α
    is too small for the calibration size (k > n_cal).
    """
    from pipelines_rj_sms_spark.functions.sampling import _key_hash

    bucket = _key_hash([F.col(c) for c in key_cols], "md5", salt) % 100
    tagged = df.withColumn("_fit", bucket < F.lit(int(fit_pct)))
    coefs = ridge_regression_2f(
        tagged.filter(F.col("_fit")), x1_units, x2_units, y_units,
        lam=lam).select(
            F.col("n").alias("n_fit"), "coef_x1", "coef_x2",
            "intercept")
    cal = tagged.filter(~F.col("_fit")).join(F.broadcast(coefs))
    pred = (F.col("coef_x1") * F.col(x1_units).cast("double")
            + F.col("coef_x2") * F.col(x2_units).cast("double")
            + F.col("intercept"))
    resid_u = F.floor(F.abs(F.col(y_units).cast("double") - pred)
                      * F.lit(float(resid_scale))
                      + F.lit(0.5)).cast("long")
    sup = (cal.select(resid_u.alias("_r"), "n_fit", "coef_x1",
                      "coef_x2", "intercept")
           .groupBy("_r", "n_fit", "coef_x1", "coef_x2", "intercept")
           .agg(F.count("*").alias("_c")))
    # distributed prefix sum over the residual-unit support — no
    # SinglePartition exchange (operators/ids.global_cumsum)
    from pipelines_rj_sms_spark.operators.ids import global_cumsum
    sup_cum = global_cumsum(sup, ["_r"], ["_c"])
    ntot = F.broadcast(sup_cum.agg(F.max("_cum__c").alias("_ncal")))
    sup = (sup_cum.crossJoin(ntot)
           .withColumn("_cum", F.col("_cum__c"))
           .withColumn("_k", F.ceil((F.col("_ncal") + 1)
                                    * F.lit(1.0 - float(alpha)))
                       .cast("long")))
    agg = sup.agg(
        F.max("n_fit").alias("n_fit"),
        F.max("_ncal").cast("bigint").alias("n_cal"),
        F.max("_k").cast("bigint").alias("k"),
        F.max("coef_x1").alias("coef_x1"),
        F.max("coef_x2").alias("coef_x2"),
        F.max("intercept").alias("intercept"),
        F.min(F.when(F.col("_cum") >= F.col("_k"), F.col("_r")))
        .alias("_qu"))
    from pipelines_rj_sms_spark.operators.cache import track
    return track(agg.select(
        "n_fit", "n_cal", "k", "coef_x1", "coef_x2", "intercept",
        F.round(F.when(F.col("k") <= F.col("n_cal"),
                       F.col("_qu").cast("double")
                       / F.lit(float(resid_scale))), 6)
        .alias("q_hat")), sup_cum)


def best_split_binary(df: DataFrame, feature_col: str, label_col: str,
                      top: int = 3) -> DataFrame:
    """1-D decision-stump split finder: rank every candidate threshold
    "feature ≤ v" by information gain against a binary label (public
    formula) — the feature-screening primitive behind tree learners
    and binning pipelines ("which quantity cutoff best predicts a
    return?").

        gain(v) = h(p) − [n_l/N·h(p_l) + n_r/N·h(p_r)],
        h(p) = −p·ln p − (1−p)·ln(1−p)   (0·ln 0 = 0)

    Scale shape: ONE hash aggregation collapses the facts to the
    (value, count, positives) support; cumulative windows over that
    collapsed domain give every split's four cell counts at once
    (no per-threshold rescan — |support| thresholds for one pass);
    shares are exact BIGINT rationals, entropies fixed IEEE
    expressions, ordering on (rounded gain DESC, v ASC) is engine-
    deterministic. Returns the ``top`` rows:
    (split_value, n_left, n_right, pos_left, pos_right, gain) @6dp.
    """
    lab = F.col(label_col).cast("long")
    sup = (df.filter(F.col(feature_col).isNotNull()
                     & F.col(label_col).isNotNull())
           .groupBy(F.col(feature_col).alias("_v"))
           .agg(F.count("*").alias("_c"), F.sum(lab).alias("_p")))
    # distributed prefix sums over the collapsed support + broadcast
    # grand totals (= last prefix sums) — no SinglePartition exchange
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import global_cumsum
    cc = global_cumsum(sup, ["_v"], ["_c", "_p"])
    tots = F.broadcast(cc.agg(F.max("_cum__c").alias("_n"),
                              F.max("_cum__p").alias("_pt")))
    base = (cc.crossJoin(tots)
            .select("_v", F.col("_cum__c").alias("_nl"),
                    F.col("_cum__p").alias("_pl"), "_n", "_pt"))
    # drop the degenerate full split (right side empty)
    base = base.filter(F.col("_nl") < F.col("_n"))

    def h(pos, tot):
        share = pos.cast("double") / tot.cast("double")
        term1 = F.when((pos > 0) & (pos < tot),
                       -share * F.log(share)).otherwise(F.lit(0.0))
        term2 = F.when((pos > 0) & (pos < tot),
                       -(F.lit(1.0) - share)
                       * F.log(F.lit(1.0) - share)).otherwise(F.lit(0.0))
        return term1 + term2

    nr = F.col("_n") - F.col("_nl")
    pr = F.col("_pt") - F.col("_pl")
    wl = F.col("_nl").cast("double") / F.col("_n").cast("double")
    wr = nr.cast("double") / F.col("_n").cast("double")
    gain = (h(F.col("_pt"), F.col("_n"))
            - (wl * h(F.col("_pl"), F.col("_nl")) + wr * h(pr, nr)))
    scored = base.select(
        F.col("_v").alias("split_value"),
        F.col("_nl").cast("bigint").alias("n_left"),
        nr.cast("bigint").alias("n_right"),
        F.col("_pl").cast("bigint").alias("pos_left"),
        pr.cast("bigint").alias("pos_right"),
        F.round(gain, 6).alias("gain"))
    return track(scored.orderBy(F.col("gain").desc(), "split_value")
                 .limit(top), cc)
