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
    wt = Window.partitionBy()
    tot = F.sum("_n").over(wt).cast("double")
    pij = F.col("_n") / tot
    pi = F.sum("_n").over(wa) / tot
    pj = F.sum("_n").over(wb) / tot
    contrib = pij * F.log(pij / (pi * pj))
    # det_sum: the MI contributions are computed doubles summed across
    # partitions — quantized accumulation keeps the single-row output
    # identical under any combine order (functions/numeric.py)
    return (joint
            .select(contrib.alias("_mi"), F.col("_n"))
            .agg(det_sum(F.col("_mi")).alias("mi_nats"),
                 F.sum("_n").cast("bigint").alias("n_rows")))


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
                 # det_sum on every p-term: order-independent under
                 # partial aggregation (functions/numeric.py)
                 F.round(det_sum(-F.col("_p") * F.log("_p")), 6)
                 .alias("entropy"),
                 F.round(F.when(
                     F.count("*") > 1,
                     det_sum(-F.col("_p") * F.log("_p"))
                     / F.log(F.count("*").cast("double")))
                     .otherwise(F.lit(0.0)), 6)
                 .alias("entropy_normalized"),
                 F.round(det_sum(F.col("_p") * F.col("_p")), 6)
                 .alias("simpson")))
