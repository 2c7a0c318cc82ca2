"""Single-pass column profiling (the Deequ/dbt-profile analog).

The reference's quality checks are per-table point probes (row counts,
freshness — quality/checks.py covers those); what an operator running
a 100 TB lake also wants is a *profile*: per-column null rates,
cardinalities, dominant values, bounds — the input to schema-contract
drift alerts and to "is this ingestion sane" eyeballing.

Scale shape: the naive spelling runs one job per column per metric
(Spark's own `df.summary()` does a full pass per statistics family and
nothing for top values). Here the table is UNPIVOTED once —
explode(array(struct(name, value)...)) is a narrow map — and every
metric for every column comes out of ONE (column, value) hash
aggregation plus two tiny follow-ups on the already-collapsed counts
(at most sum-of-cardinalities rows). One wide scan, one real shuffle,
regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.numeric import det_sum


def profile_table(df: DataFrame,
                  columns: list[str] | None = None) -> DataFrame:
    """One row per profiled column:

    - ``n_rows`` / ``n_nulls`` — total and null observation counts;
    - ``n_distinct`` — exact distinct non-null values;
    - ``top_value`` / ``top_count`` — the modal non-null value (ties
      break on the larger value, so the profile is deterministic);
    - ``min_value`` / ``max_value`` — lexicographic bounds of the
      string rendering (documented as such: for numeric-typed audits
      keep the column typed and use an ordinary agg).

    Values are profiled in their string rendering, which makes one
    unpivoted pass possible across heterogeneous column types — the
    trade Deequ makes for its frequent-items pass as well. For
    unbounded-cardinality columns swap `n_distinct` for a sketch
    (operators/sketches.py) upstream; the exact profile is the oracle
    path.
    """
    cols = columns or df.columns
    pairs = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in cols]))
    counts = (df.select(pairs.alias("_p"))
              .select("_p.column", "_p.value")
              .groupBy("column", "value")
              .agg(F.count("*").alias("cnt")))
    # modal value via max(struct(cnt, value)) — one aggregation instead
    # of a window + self-join, so the counts subplan (and the wide
    # source scan under it) is consumed exactly once
    top = F.max(F.when(
        F.col("value").isNotNull(),
        F.struct(F.col("cnt"), F.col("value"))))
    return counts.groupBy("column").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt"))
              .otherwise(F.lit(0))).alias("n_nulls"),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1)))
        .alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        top["value"].alias("top_value"),
        top["cnt"].alias("top_count"),
    )


def correlation_matrix(df: DataFrame, cols: list[str],
                       scale: int = 10**9) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE pass:
    all p·(p−1)/2 `corr` aggregates ride in a single HashAggregate
    (one scan, no matter how many pairs), then unpivot to
    (col_a, col_b, corr) rows. The profiling companion for feature
    redundancy and sanity checks; for p large enough that p² state
    matters, sample first — corr estimates converge fast.
    """
    # closed-form Pearson over det-quantized sums, not F.corr: the
    # built-in accumulates running co-moments in doubles whose combine
    # order moves the last ulp across runs/engines; quantized Σx, Σy,
    # Σxy, Σx², Σy² are exact and associate freely
    # (functions/numeric.py). Still ONE HashAggregate pass.
    # ``scale``: quantization is exact only while |x²|·scale < 2^53 —
    # for columns up to ~1e2 the 1e9 default holds; pass a smaller
    # scale for money-magnitude columns (1e4 keeps 1e10 squares exact).
    from pipelines_rj_sms_spark.functions.numeric import (det_sum,
                                                          det_sum_big)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for i, (a, b) in enumerate(pairs):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        x = F.when(both, F.col(a))
        y = F.when(both, F.col(b))
        aggs += [F.count(x).alias(f"_n_{i}"),
                 det_sum(x, scale).alias(f"_sx_{i}"),
                 det_sum(y, scale).alias(f"_sy_{i}"),
                 det_sum_big(x * y, scale).alias(f"_sxy_{i}"),
                 det_sum_big(x * x, scale).alias(f"_sxx_{i}"),
                 det_sum_big(y * y, scale).alias(f"_syy_{i}")]
    wide = df.agg(*aggs)

    def _corr(i):
        n = F.col(f"_n_{i}").cast("double")
        cov_n = n * F.col(f"_sxy_{i}") - F.col(f"_sx_{i}") * F.col(f"_sy_{i}")
        vx = n * F.col(f"_sxx_{i}") - F.col(f"_sx_{i}") * F.col(f"_sx_{i}")
        vy = n * F.col(f"_syy_{i}") - F.col(f"_sy_{i}") * F.col(f"_sy_{i}")
        return F.when((vx > 0) & (vy > 0),
                      cov_n / F.sqrt(vx * vy))

    rows = F.explode(F.array(*[
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 _corr(i).alias("corr"))
        for i, (a, b) in enumerate(pairs)]))
    return wide.select(rows.alias("_r")).select(
        "_r.col_a", "_r.col_b", "_r.corr")


def mutual_information(df: DataFrame, col_a: str,
                       col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns —
    the dependency detector that catches what correlation can't
    (nonlinear / non-ordinal association), standard in feature audits.

    MI = Σ_ij p_ij · ln(p_ij / (p_i · p_j)) over the joint
    distribution. One (a, b) hash aggregation builds the joint table;
    margins come from window sums OVER THE COLLAPSED JOINT (at most
    |A|·|B| rows — never the data); the result is one row:
    (mi_nats, n_rows). Nulls count as a category of their own (they
    carry dependency signal too).
    """
    from pyspark.sql import Window

    joint = (df.select(
        F.coalesce(F.col(col_a).cast("string"), F.lit("\x00null"))
        .alias("_a"),
        F.coalesce(F.col(col_b).cast("string"), F.lit("\x00null"))
        .alias("_b"))
        .groupBy("_a", "_b").agg(F.count("*").alias("_n")))
    wa = Window.partitionBy("_a")
    wb = Window.partitionBy("_b")
    # grand total as a broadcast 1-row aggregate, not a whole-frame
    # window (which exchanges every joint cell to one partition)
    tot_row = F.broadcast(joint.agg(
        F.sum("_n").cast("double").alias("_tot"),
        F.sum("_n").cast("bigint").alias("_nr")))
    tot = F.col("_tot")
    pij = F.col("_n") / tot
    pi = F.sum("_n").over(wa) / tot
    pj = F.sum("_n").over(wb) / tot
    # ln pinned to the 1e-6 grid before the p_ij multiply
    # (functions/numeric.py "pinned transcendental values")
    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          det_log_units)
    contrib = pij * (det_log_units(pij / (pi * pj))
                     / F.lit(float(LOG_SCALE)))
    # det_sum: the MI contributions are computed doubles summed across
    # partitions — quantized accumulation keeps the single-row output
    # identical under any combine order (functions/numeric.py)
    return (joint.crossJoin(tot_row)
            .select(contrib.alias("_mi"), F.col("_nr"))
            .agg(det_sum(F.col("_mi")).alias("mi_nats"),
                 F.max("_nr").alias("n_rows")))


def spearman_correlation(df: DataFrame, col_a: str,
                         col_b: str) -> DataFrame:
    """Spearman rank correlation (average-rank tie method), exact and
    scalable — the monotone-association companion to
    :func:`correlation_matrix` (Pearson misses nonlinear-but-monotone
    relations; Spearman is Pearson over the ranks).

    Scale shape: global fractional ranks normally mean a global sort of
    the data. Here each column first collapses to its distinct-value
    counts (one hash aggregation), the cumulative window that turns
    counts into average ranks runs OVER THE COLLAPSED value table —
    cardinality |distinct values|, never the data — and the joint
    (a, b) contingency rollup joins the two small rank maps back. The
    data itself is touched by exactly two hash aggregations.

    Determinism: average ranks are held in half-units (2·rank is an
    integer even when ties average to .5), centered by the integer
    n + 1, and every moment is an exact DECIMAL(38,0) integer sum.
    Only the final rho division happens in doubles — one expression,
    engine-identical (functions/numeric.py discipline). Output is one
    row: (n_rows, rho_spearman), rho rounded to 6.
    """
    from pyspark.sql import Window

    from pipelines_rj_sms_spark.operators.cache import track

    base = (df.filter(F.col(col_a).isNotNull()
                      & F.col(col_b).isNotNull())
            .select(F.col(col_a).alias("_x"), F.col(col_b).alias("_y")))
    # the collapsed joint feeds both rank maps, the total AND the
    # moment join — persist so the data aggregates once
    joint = (base.groupBy("_x", "_y").agg(F.count("*").alias("_n"))
             .persist())

    def rank_map(c):
        # avg rank of value v = (#less) + (count(v) + 1) / 2; in
        # half-units: 2*cum - cnt + 1 with cum the inclusive cumsum
        # over the ordered DISTINCT-value table — a DISTRIBUTED
        # prefix sum (operators/ids.global_cumsum), so a
        # near-continuous column whose support approaches data size
        # never funnels through a SinglePartition window
        from pipelines_rj_sms_spark.operators.ids import global_cumsum
        vals = global_cumsum(
            joint.groupBy(c).agg(F.sum("_n").alias("_c")), [c], ["_c"])
        # re-attach: select() drops the attr chain track() set on vals
        return track(vals.select(
            c, (2 * F.col("_cum__c") - F.col("_c") + 1).alias(f"_r2{c}")),
            vals)

    d38 = "decimal(38,0)"
    rx = F.col("_r2_x").cast(d38)
    ry = F.col("_r2_y").cast(d38)
    n_tot = F.col("_nt").cast(d38)
    w = F.col("_n").cast(d38)
    # centered half-ranks: mean of 2*rank is exactly n + 1, so the
    # centered sums are zero by construction and rho reduces to
    # cov / sqrt(var_x * var_y) with no mean terms
    cx = rx - (n_tot + 1)
    cy = ry - (n_tot + 1)
    tot = F.broadcast(joint.agg(F.sum("_n").alias("_nt")))
    rmx, rmy = rank_map("_x"), rank_map("_y")
    moments = (joint
               .join(rmx, "_x")
               .join(rmy, "_y")
               .crossJoin(tot)
               .agg(F.max("_nt").alias("n_rows"),
                    F.sum(w * cx * cy).alias("_sxy"),
                    F.sum(w * cx * cx).alias("_sxx"),
                    F.sum(w * cy * cy).alias("_syy")))
    rho = F.when(
        (F.col("_sxx") > 0) & (F.col("_syy") > 0),
        F.col("_sxy").cast("double")
        / F.sqrt(F.col("_sxx").cast("double")
                 * F.col("_syy").cast("double")))
    return track(moments.select(
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(rho, 6).alias("rho_spearman")), joint, rmx, rmy)


def chi2_independence(df: DataFrame, col_a: str,
                      col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V — the effect-size the raw statistic lacks
    (chi2 grows with N; V = sqrt(chi2 / (N·(min(r,c)−1))) is 0..1).
    The significance-testing sibling of :func:`mutual_information`.

    One (a, b) hash aggregation builds the contingency rollup; margins
    come from window sums OVER THE COLLAPSED rollup (at most |A|·|B|
    rows — never the data). Nulls count as a category. Expected counts
    and per-cell terms are single double expressions over exact integer
    counts (engine-identical); the chi2 total accumulates det-quantized
    at 1e-6 units via DECIMAL so cell-combine order can't move it
    (functions/numeric.py). One row: (n_rows, n_a, n_b, dof, chi2,
    cramers_v), floats rounded to 6.
    """
    from pyspark.sql import Window

    from pipelines_rj_sms_spark.functions.numeric import det_units

    joint = (df.select(
        F.coalesce(F.col(col_a).cast("string"), F.lit("\x00null"))
        .alias("_a"),
        F.coalesce(F.col(col_b).cast("string"), F.lit("\x00null"))
        .alias("_b"))
        .groupBy("_a", "_b").agg(F.count("*").alias("_n")))
    wa, wb = Window.partitionBy("_a"), Window.partitionBy("_b")
    # grand total as a broadcast 1-row aggregate, not a whole-frame
    # window (which exchanges every joint cell to one partition)
    nt_row = F.broadcast(joint.agg(
        F.sum("_n").cast("double").alias("_nt")))
    joint = joint.crossJoin(nt_row)
    ra = F.sum("_n").over(wa).cast("double")
    cb = F.sum("_n").over(wb).cast("double")
    nt = F.col("_nt")
    e = ra * cb / nt
    term = (F.col("_n").cast("double") - e) * (F.col("_n") - e) / e
    scale = 1_000_000  # chi2 cells can reach N; 1e-6 units keep
    # |term|*scale < 2**53 to N ~ 9e9 rows (capacity rule)

    # cells with zero observed count never appear in the rollup, but
    # each still owes its expected mass to chi2 ((0-e)²/e = e); their
    # total is N - Σ_present e, closed-form from the present cells —
    # no dense |A|x|B| materialization needed
    agg = (joint
           .select(F.col("_n"), F.col("_a"), F.col("_b"),
                   det_units(term, scale).alias("_t_units"),
                   det_units(e, scale).alias("_e_units"))
           .agg(F.sum("_n").cast("bigint").alias("n_rows"),
                F.count_distinct("_a").alias("n_a"),
                F.count_distinct("_b").alias("n_b"),
                (F.sum(F.col("_t_units").cast("decimal(38,0)"))
                 .cast("double") / F.lit(float(scale))).alias("_chi2_p"),
                (F.sum(F.col("_e_units").cast("decimal(38,0)"))
                 .cast("double") / F.lit(float(scale))).alias("_e_p"))
           .withColumn("_chi2",
                       F.col("_chi2_p")
                       + (F.col("n_rows").cast("double") - F.col("_e_p"))))
    v = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1),
        F.sqrt(F.col("_chi2")
               / (F.col("n_rows")
                  * (F.least(F.col("n_a"), F.col("n_b")) - 1))))
    return agg.select(
        "n_rows", "n_a", "n_b",
        ((F.col("n_a") - 1) * (F.col("n_b") - 1)).alias("dof"),
        F.round("_chi2", 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"))


def diversity_report(df, group_cols: list[str], category_col: str):
    """Per-group categorical diversity audit: Shannon entropy (nats),
    normalized entropy (vs ln of the category count), and the Simpson
    concentration Σp² — the corpus-mix gate ("is this source all one
    language?" / "did the mix collapse after filtering?").

    One hash aggregation collapses to (group, category) counts; group
    margins come from a window over the COLLAPSED rollup (cardinality
    = groups x categories), never the data — same discipline as
    `mutual_information`. Nulls count as a category. Floats round 6.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          det_log_units)

    def _pln(x):
        return det_log_units(x) / F.lit(float(LOG_SCALE))

    gcols = [F.col(c) for c in group_cols]
    joint = df.groupBy(*gcols, F.col(category_col).alias("_cat")).agg(
        F.count("*").alias("_n"))
    w = Window.partitionBy(*gcols)
    tot = F.sum("_n").over(w)
    p = F.col("_n") / tot
    return (joint
            .withColumn("_p", p)
            .groupBy(*gcols)
            .agg(F.sum("_n").cast("bigint").alias("n_rows"),
                 F.count("*").alias("n_categories"),
                 # det_sum on every p-term, with each ln pinned to the
                 # 1e-6 grid (functions/numeric.py "pinned
                 # transcendental values") — order-independent AND
                 # cross-engine-libm-proof
                 F.round(det_sum(-F.col("_p") * _pln(F.col("_p"))), 6)
                 .alias("entropy"),
                 F.round(F.when(
                     F.count("*") > 1,
                     det_sum(-F.col("_p") * _pln(F.col("_p")))
                     / _pln(F.count("*").cast("double")))
                     .otherwise(F.lit(0.0)), 6)
                 .alias("entropy_normalized"),
                 F.round(det_sum(F.col("_p") * F.col("_p")), 6)
                 .alias("simpson")))


def ordinal_association(df: DataFrame, col_a: str,
                        col_b: str) -> DataFrame:
    """Goodman–Kruskal gamma and Kendall tau-b between two ORDINAL
    columns — the monotone-association measures for ordered categories
    (priority scales, severity grades), where chi-square ignores order
    and Spearman over raw codes is the degenerate case. Both are
    functions of concordant/discordant pair counts (public formulas):

        gamma = (C − D) / (C + D)
        tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2)),
        n0 = n(n−1)/2,  n1/n2 = Σ t(t−1)/2 over the a/b margins

    Scale shape: the data collapses to the contingency rollup in one
    hash aggregation; pair enumeration is a self-join of the COLLAPSED
    cells with the (a2 > a1) inequality — ordinal scales are small by
    nature, so |cells|² is bounded (a 50×50 scale is 6.25M cell pairs,
    trivial; this operator is NOT for high-cardinality nominals —
    that's :func:`mutual_information`'s job). All pair counts are
    exact DECIMAL(38,0) integers; gamma and tau_b are one final double
    expression each. One row: (n_rows, concordant, discordant, gamma,
    tau_b), floats rounded to 6.
    """
    from pipelines_rj_sms_spark.operators.cache import track

    # the contingency cells feed the pair self-join (both sides), two
    # margin rollups and the totals — persist the collapsed frame
    joint = (df.filter(F.col(col_a).isNotNull()
                       & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("_a"),
                      F.col(col_b).alias("_b"))
             .agg(F.count("*").alias("_n"))
             .persist())
    d38 = "decimal(38,0)"
    lo = joint.select(F.col("_a").alias("_a1"),
                      F.col("_b").alias("_b1"),
                      F.col("_n").cast(d38).alias("_n1"))
    hi = joint.select(F.col("_a").alias("_a2"),
                      F.col("_b").alias("_b2"),
                      F.col("_n").cast(d38).alias("_n2"))
    pairs = lo.join(hi, F.col("_a2") > F.col("_a1"))
    pair_agg = F.broadcast(pairs.agg(
        F.coalesce(F.sum(F.when(F.col("_b2") > F.col("_b1"),
                                F.col("_n1") * F.col("_n2"))),
                   F.lit(0).cast(d38)).alias("_c"),
        F.coalesce(F.sum(F.when(F.col("_b2") < F.col("_b1"),
                                F.col("_n1") * F.col("_n2"))),
                   F.lit(0).cast(d38)).alias("_d")))

    def tie_pairs(c):
        m = joint.groupBy(c).agg(F.sum("_n").cast(d38).alias("_t"))
        return m.agg((F.sum(F.col("_t") * (F.col("_t") - 1))
                      / 2).cast(d38).alias("_tp"))

    totals = (joint.agg(F.sum("_n").cast(d38).alias("_nr"))
              .crossJoin(tie_pairs("_a").withColumnRenamed("_tp", "_n1t"))
              .crossJoin(tie_pairs("_b").withColumnRenamed("_tp", "_n2t"))
              .crossJoin(pair_agg))
    n0 = (F.col("_nr") * (F.col("_nr") - 1) / 2).cast(d38)
    cd = (F.col("_c") - F.col("_d")).cast("double")
    gamma = F.when((F.col("_c") + F.col("_d")) > 0,
                   cd / (F.col("_c") + F.col("_d")).cast("double"))
    denom = F.sqrt((n0 - F.col("_n1t")).cast("double")
                   * (n0 - F.col("_n2t")).cast("double"))
    tau_b = F.when(denom > 0, cd / denom)
    return track(totals.select(
        F.col("_nr").cast("bigint").alias("n_rows"),
        F.col("_c").cast("bigint").alias("concordant"),
        F.col("_d").cast("bigint").alias("discordant"),
        F.round(gamma, 6).alias("gamma"),
        F.round(tau_b, 6).alias("tau_b")), joint)
