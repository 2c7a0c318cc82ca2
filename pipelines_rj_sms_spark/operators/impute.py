"""Group-aware null imputation — the repair stage of conformance.

The reference's cleaning utilities drop or blank bad values
(data_cleaning.py shapes); a training/analytics pipeline usually wants
to *repair* instead: fill a missing measurement with its group's
central value (median/mean for numerics, mode for categoricals) so
downstream aggregates and models keep the row.

Scale shape: per-group fill statistics are ONE hash aggregation over
the groups (exact `percentile` for medians — swap for KLL sketches in
operators/sketches.py when a group's values don't fit an executor);
the fills join back broadcast (groups ≪ rows), so the data itself
never shuffles — imputation is a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"mean", "median"}


def impute_group_stats(df: DataFrame, group_cols: list[str],
                       strategies: dict[str, str],
                       flag: bool = True) -> DataFrame:
    """Fill nulls in each ``strategies`` column with its group's
    statistic: ``mean`` | ``median`` (exact interpolated percentile) |
    ``mode`` (most frequent non-null value, ties to the larger value
    so the repair is deterministic).

    Adds ``<col>_was_missing`` flags when ``flag``. Rows in groups
    where the statistic is undefined (all-null group) keep their null.
    Numeric fills come from one aggregation; each mode column costs
    one extra (group, value) aggregation — all joined back broadcast.
    """
    numeric_aggs = []
    mode_cols = []
    for c, s in strategies.items():
        if s == "mean":
            # det_sum/count: the fill value lands in compared output
            # columns, so the mean must be combine-order-exact
            from pipelines_rj_sms_spark.functions.numeric import det_sum
            numeric_aggs.append(
                (det_sum(F.col(c)) / F.count(c)).alias(f"_fill_{c}"))
        elif s == "median":
            numeric_aggs.append(
                F.expr(f"percentile({c}, 0.5)").alias(f"_fill_{c}"))
        elif s == "mode":
            mode_cols.append(c)
        else:
            raise ValueError(f"unknown strategy for {c}: {s}")

    out = df
    if numeric_aggs:
        stats = df.groupBy(*group_cols).agg(*numeric_aggs)
        out = out.join(F.broadcast(stats), group_cols, "left")
    for c in mode_cols:
        top = F.max(F.when(F.col(c).isNotNull(),
                           F.struct(F.col("_cnt"), F.col(c))))
        mode_stat = (
            df.groupBy(*group_cols, c)
            .agg(F.count(c).alias("_cnt"))
            .groupBy(*group_cols)
            .agg(top[c].alias(f"_fill_{c}"))
        )
        out = out.join(F.broadcast(mode_stat), group_cols, "left")

    for c in strategies:
        if flag:
            out = out.withColumn(f"{c}_was_missing", F.col(c).isNull())
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_fill_{c}")))
    return out.drop(*[f"_fill_{c}" for c in strategies])
