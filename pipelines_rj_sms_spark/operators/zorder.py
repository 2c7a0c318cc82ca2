"""Z-order (Morton) clustering for multi-column data skipping.

The lakehouse compaction pass supports linear sort-clustering
(`sinks/lakehouse.compact_partitions(sort_cols=...)`), which gives
tight parquet min/max footer stats — but only for the leading sort
column: a predicate on any other column still scans every file.
Z-ordering interleaves the bits of several columns' rank-buckets into
one clustering key, so every participating column gets *partially*
tight per-file ranges: for N files, a point query on any one of the
z-columns prunes to ~sqrt(N) files instead of 1 (leading) / N (all the
others). That balance is exactly Delta/Iceberg's OPTIMIZE ZORDER
semantics, re-expressed as plain Spark expressions.

Mechanics (all JVM-side, no UDF):
1. Per column, compute 2^bits - 1 quantile boundaries via
   ``approxQuantile`` — a driver-bounded sketch pass (same cost class
   as the IVF trainer's sample); quantile buckets make the key robust
   to skewed distributions where raw value-range buckets collapse.
2. Bucket id = count of boundaries <= value, an ``aggregate`` fold
   over a literal array (15 comparisons at the default 4 bits).
3. Morton key = bitwise interleave of the per-column bucket bits.
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the key: range
   partitioning bounds each output file to a contiguous Morton range,
   which is what makes footers prunable.

Numeric and date/timestamp columns are supported (temporal casts to
epoch seconds for quantiles). Strings would need a sampled dictionary
to stay order-preserving — out of scope, raise instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def _as_double(df: DataFrame, col: str) -> F.Column:
    dt = df.schema[col].dataType
    if isinstance(dt, _TEMPORAL):
        return F.col(col).cast("timestamp").cast("double")
    if isinstance(dt, _NUMERIC):
        return F.col(col).cast("double")
    raise TypeError(
        f"zorder column {col!r} has unsupported type {dt.simpleString()}; "
        "numeric and date/timestamp columns only")


def zorder_key(df: DataFrame, cols: list[str],
               bits_per_col: int = 4,
               relative_error: float = 0.01) -> F.Column:
    """Morton-interleaved clustering key over ``cols`` as a Column.

    One bounded driver action (the quantile sketch) per call; nulls
    sort first (bucket 0).
    """
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    ncols = len(cols)

    tmp = df.select(*[_as_double(df, c).alias(f"_z{i}")
                      for i, c in enumerate(cols)])
    bounds = {
        i: tmp.stat.approxQuantile(f"_z{i}", probs, relative_error)
        for i in range(ncols)
    }

    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = _as_double(df, c)
        # strict >: when the distribution has mass at its minimum, the
        # low quantile boundaries equal that minimum and a >= fold
        # would push everything out of bucket 0
        bucket = F.aggregate(
            F.array(*[F.lit(b) for b in bounds[i]]),
            F.lit(0),
            lambda acc, b: acc + F.when(x > b, 1).otherwise(0),
        )
        bucket = F.coalesce(bucket, F.lit(0))  # nulls -> first bucket
        for bit in range(bits_per_col):
            key = key + (
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * ncols + (ncols - 1 - i),
                ).cast("long")
            )
    return key


def cluster_zorder(df: DataFrame, cols: list[str],
                   num_files: int, bits_per_col: int = 4) -> DataFrame:
    """Return ``df`` arranged so a write produces ~``num_files`` files,
    each covering a contiguous Morton range of ``cols`` — write with
    ``.write.parquet(...)`` and every z-column's footer stats prune.
    """
    key = zorder_key(df, cols, bits_per_col)
    return (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
