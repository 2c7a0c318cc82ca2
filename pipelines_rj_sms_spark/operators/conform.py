"""Schema conformance — the reference's ingest posture, Spark-side.

The reference ingests everything as strings (utils/tasks.py:959,
datalake/utils/data_transformations.py:125-129), normalizes headers
(utils/data_cleaning.py:11-47), adds audit columns (utils/tasks.py:649-675),
pads missing expected columns (bq_to_subpav/utils.py:184-201), and derives
date partitions (utils/tasks.py:1276-1309). Each of those is one narrow
projection here — no shuffles, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.cleaning import clean_column_names


def stringify(df: DataFrame) -> DataFrame:
    """Cast every column to string (the reference's raw-zone invariant)."""
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])


def add_audit_columns(df: DataFrame, source: str | None = None,
                      run_id: str | None = None) -> DataFrame:
    """Append the reference's load-metadata columns (SURVEY §1.1)."""
    out = df.withColumn("_loaded_at", F.current_timestamp())
    if source is not None:
        out = out.withColumn("_source", F.lit(source))
    if run_id is not None:
        out = out.withColumn("_run_id", F.lit(run_id))
    return out


def ensure_columns(df: DataFrame, expected: dict[str, str],
                   fill: str | None = None) -> DataFrame:
    """Add any missing expected column (name -> type) with a fill value,
    and order columns as expected-first (bq_to_subpav/utils.py:184-201)."""
    out = df
    for name, dtype in expected.items():
        if name not in out.columns:
            out = out.withColumn(name, F.lit(fill).cast(dtype))
    rest = [c for c in out.columns if c not in expected]
    return out.select(*[F.col(c) for c in expected], *rest)


def with_date_partitions(df: DataFrame, ts_col: str,
                         partition_col: str = "data_particao") -> DataFrame:
    """Derive the reference's ano/mes/data_particao partition columns from a
    timestamp column (utils/tasks.py:1276-1309). Downstream writes use
    ``partitionBy("ano_particao","mes_particao","data_particao")`` giving
    the identical Hive directory scheme and free partition pruning.
    """
    d = F.col(ts_col).cast("date")
    return (
        df.withColumn("ano_particao", F.year(d))
        .withColumn("mes_particao", F.month(d))
        .withColumn(partition_col, d)
    )


def safe_cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """try_cast (BigQuery SAFE_CAST parity, P4) for each named column."""
    out = df
    for name, dtype in casts.items():
        out = out.withColumn(name, F.col(name).try_cast(dtype))
    return out


def conform(df: DataFrame, source: str | None = None) -> DataFrame:
    """Full conform chain: clean names -> stringify -> audit columns."""
    return add_audit_columns(stringify(clean_column_names(df)), source=source)


def non_blank(col: Column | str) -> Column:
    """P7: trimmed-non-empty predicate (fillna('').strip() != '')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.coalesce(c, F.lit(""))) != ""


def standardize(df, cols: list[str], key_cols: list[str] | None = None,
                suffix: str = "_z"):
    """Z-score feature standardization: (x - mean) / stddev per column,
    optionally within groups — the scalable expression form of the
    fit/transform scaler (the applyInPandas robust variant lives in
    `operators/grouped.py`; this one never ships rows to Python).

    Stats for ALL columns come from ONE hash aggregation (broadcast
    back on the keys, or as a 1-row frame globally); constant columns
    (stddev 0/null) yield null scores rather than Inf. Appends
    ``<col><suffix>`` columns, originals untouched. Rounded to 6.

    Mean/stddev come from det-quantized Σx and Σx² (closed-form sample
    variance), not avg/stddev_samp, so the fitted scaler is identical
    under any partial-aggregation order (functions/numeric.py).
    """
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.functions.numeric import (det_sum,
                                                          det_sum_big)
    keys = list(key_cols or [])
    aggs = []
    for c in cols:
        aggs += [F.count(c).alias(f"_n_{c}"),
                 det_sum(F.col(c)).alias(f"_s_{c}"),
                 det_sum_big(F.col(c) * F.col(c)).alias(f"_q_{c}")]
    stats = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    mcols = []
    for c in cols:
        n, s, q = (F.col(f"_n_{c}"), F.col(f"_s_{c}"), F.col(f"_q_{c}"))
        var = F.when(n > 1, (q - s * s / n) / (n - 1))
        mcols += [(s / n).alias(f"_mu_{c}"),
                  F.sqrt(F.greatest(var, F.lit(0.0))).alias(f"_sd_{c}")]
    stats = stats.select(*keys, *mcols)
    joined = (df.join(F.broadcast(stats), keys) if keys
              else df.crossJoin(F.broadcast(stats)))
    out = joined
    for c in cols:
        z = F.when(F.col(f"_sd_{c}") > 0,
                   F.round((F.col(c) - F.col(f"_mu_{c}"))
                           / F.col(f"_sd_{c}"), 6))
        out = out.withColumn(f"{c}{suffix}", z)
    return out.drop(*[f"_mu_{c}" for c in cols],
                    *[f"_sd_{c}" for c in cols])
