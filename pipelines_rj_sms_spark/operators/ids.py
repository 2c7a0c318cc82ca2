"""Dense, consecutive, globally-ordered row ids — without a global sort.

`row_number() OVER (ORDER BY ...)` plans a single-partition window: the
whole dataset funnels through one task, the classic scale cliff. The
distributed recipe (RDD zipWithIndex, DataFrame-shaped): range-partition
on the order keys, sort within partitions, take per-partition row
counts with one bounded aggregation job, and assign
``id = partition_offset + position_in_partition`` as a pure projection.
Data is scanned twice but never concentrated; the second pass is
expression-only (no Python, no extra shuffle).

Position within the partition comes from ``monotonically_increasing_id``
(consecutive per partition by construction) re-based by the partition's
min — both frozen by a persist so the offset job and the projection see
the same values.

Use cases: training-shard row addressing, stable example ids after a
curation pass, reproducible dataset ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.cache import track


def dense_global_ids(df: DataFrame, order_cols: list[str],
                     id_col: str = "row_id",
                     num_partitions: int | None = None) -> DataFrame:
    """Assign ids 0..n-1 in ``order_cols`` order (which must be a total
    order — include a unique tiebreaker column, or ties get an
    arbitrary stable order within equal keys).

    Release the persisted intermediate via ``operators.cache.release``
    when done.
    """
    part = (df.repartitionByRange(num_partitions, *order_cols)
            if num_partitions else df.repartitionByRange(*order_cols))
    base = (
        part.sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()  # freeze partitioning + _mid across the two passes
    )
    stats = (base.groupBy("_pid")
             .agg(F.count("*").alias("_n"), F.min("_mid").alias("_mid0"))
             .collect())
    offset, rows = 0, []
    for r in sorted(stats, key=lambda r: r["_pid"]):
        rows.append((r["_pid"], offset, r["_mid0"]))
        offset += r["_n"]

    # offsets ride back in as a broadcast dim (one row per partition —
    # bounded), keeping the final pass a shuffle-free projection
    offsets = F.broadcast(base.sparkSession.createDataFrame(
        rows, "_pid int, _off long, _mid0 long"))
    out = (base.join(offsets, "_pid")
           .withColumn(id_col,
                       (F.col("_off") + F.col("_mid") - F.col("_mid0"))
                       .cast("long"))
           .drop("_pid", "_mid", "_off", "_mid0"))
    return track(out, base)


def global_cumsum(df: DataFrame, order_cols: list[str],
                  value_cols: list[str], prefix: str = "_cum",
                  num_partitions: int | None = None) -> DataFrame:
    """Distributed inclusive prefix sums in ``order_cols`` order —
    the scale-safe replacement for ``SUM(x) OVER (ORDER BY v)`` with
    no PARTITION BY, which plans a SinglePartition exchange and
    funnels the whole input through one task (the rank/ECDF scale
    cliff named in SCALE.md).

    Two-pass prefix-sum: range-partition on the order keys, local
    cumulative sums inside each partition (a PARTITIONed window —
    parallel), one bounded aggregation job for per-partition totals,
    then partition offsets ride back as a broadcast dim and the final
    cum is a projection. Adds ``{prefix}_<col>`` (LONG) per value
    column. ``order_cols`` must be a total order (the intended inputs
    are collapsed DISTINCT-value supports, where it is by
    construction); ``value_cols`` must be integral. Release the
    persisted intermediate via ``operators.cache.release`` when done.
    """
    part = (df.repartitionByRange(num_partitions, *order_cols)
            if num_partitions else df.repartitionByRange(*order_cols))
    base = part.withColumn("_gc_pid", F.spark_partition_id()).persist()
    w = (Window.partitionBy("_gc_pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    local = base.select(
        "*", *[F.sum(c).over(w).cast("long").alias(f"{prefix}_{c}")
               for c in value_cols])
    stats = (base.groupBy("_gc_pid")
             .agg(*[F.sum(c).cast("long").alias(c) for c in value_cols])
             .collect())
    offset = {c: 0 for c in value_cols}
    rows = []
    for r in sorted(stats, key=lambda r: r["_gc_pid"]):
        rows.append((r["_gc_pid"], *[offset[c] for c in value_cols]))
        for c in value_cols:
            offset[c] += r[c] or 0
    off_schema = ", ".join(["_gc_pid int"]
                           + [f"_off_{c} long" for c in value_cols])
    offsets = F.broadcast(
        df.sparkSession.createDataFrame(rows, off_schema))
    out = local.join(offsets, "_gc_pid")
    for c in value_cols:
        out = out.withColumn(f"{prefix}_{c}",
                             F.col(f"{prefix}_{c}") + F.col(f"_off_{c}"))
    out = out.drop("_gc_pid", *[f"_off_{c}" for c in value_cols])
    return track(out, base)
