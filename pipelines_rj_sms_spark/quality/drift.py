"""Distribution drift detection — Population Stability Index.

The reference's monitors compare counts against fixed thresholds;
the question a long-running pipeline actually needs answered is
"has this column's *distribution* moved since the baseline?" — the
classic deployment gate for scoring models and the early-warning for
silent upstream changes. PSI (public, standard in model monitoring):
bucket the baseline into equal-population deciles, measure where
today's data falls, PSI = Σ (p_actual − p_expected)·ln(p_actual /
p_expected). Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25
act.

Scale shape: baseline bucket boundaries are one percentile aggregate
(broadcast, rounded to 6 dp for cross-engine replay — same discipline
as the equi-depth histogram); each side's bucket counts are one hash
aggregation; the report joins two ≤ n_buckets frames. Neither input
ever shuffles whole rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def psi_report(expected: DataFrame, actual: DataFrame, value_col: str,
               n_buckets: int = 10) -> DataFrame:
    """Per-bucket PSI between a baseline (``expected``) and a current
    sample (``actual``): (bucket, expected_share, actual_share,
    psi_contrib). Total PSI is the sum of contributions — a one-row
    driver aggregate for the caller's gate. Shares are floored at 1e-6
    so empty buckets contribute a finite penalty (standard practice).

    Buckets are the baseline's equal-population cut points; bucket 0
    also absorbs anything below the baseline minimum, bucket n-1
    anything above — new out-of-range mass shows up as inflated edge
    buckets, which is exactly the drift signal wanted.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = F.broadcast(expected.agg(F.transform(
        F.expr(f"percentile({value_col}, "
               f"array({', '.join(map(str, qs))}))"),
        lambda b: F.round(b, 6)).alias("_b")))
    bucket = F.size(F.filter(
        F.col("_b"), lambda b: b < F.col(value_col)))

    def shares(df: DataFrame, alias: str) -> DataFrame:
        counts = (df.crossJoin(bounds)
                  .select(bucket.alias("bucket"))
                  .groupBy("bucket").agg(F.count("*").alias("_n")))
        total = F.broadcast(counts.agg(
            F.sum("_n").cast("double").alias("_tot")))
        return (counts.crossJoin(total)
                .select("bucket",
                        (F.col("_n") / F.col("_tot")).alias(alias)))

    from pipelines_rj_sms_spark.functions.numeric import (
        LOG_SCALE, det_log_units)

    e = shares(expected, "expected_share")
    a = shares(actual, "actual_share")
    pe = F.greatest(F.coalesce("expected_share", F.lit(0.0)),
                    F.lit(_EPS))
    pa = F.greatest(F.coalesce("actual_share", F.lit(0.0)), F.lit(_EPS))
    return (e.join(a, "bucket", "full_outer")
            .select(
                "bucket",
                F.coalesce("expected_share", F.lit(0.0))
                .alias("expected_share"),
                F.coalesce("actual_share", F.lit(0.0))
                .alias("actual_share"),
                # ln pinned to the 1e-6 grid (functions/numeric.py)
                ((pa - pe) * (det_log_units(pa / pe)
                              / F.lit(float(LOG_SCALE))))
                .alias("psi_contrib")))
