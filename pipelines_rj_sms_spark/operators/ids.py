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

EAGER-EXECUTION CAVEAT: every helper here runs a blocking Spark job at
DataFrame-CONSTRUCTION time (the per-partition stats collect() that
computes broadcast offsets) and persists its shuffled base — building
a plan through these helpers is not side-effect free the way plain
DataFrame transforms are. Composed callers (global_shift →
with_global_index → global_cumsum) launch 2-3 jobs before the caller
executes anything. The offsets are per-partition scalars (≤ shuffle
partition count), so the collected data is bounded regardless of input
size; the cost is job-launch latency, not data movement.
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

    Eager: runs a bounded per-partition stats job at construction
    time (see module docstring).
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
    # `df` carries any upstream chain (repartitionByRange dropped it)
    return track(out, base, df)


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

    Eager: runs a bounded per-partition stats job at construction
    time (see module docstring).
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
    # `df` carries any upstream chain (repartitionByRange dropped it)
    return track(out, base, df)


def with_global_index(df: DataFrame, order_cols: list[str],
                      id_col: str = "_gidx",
                      num_partitions: int | None = None) -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` without the SinglePartition
    exchange: 1-based consecutive position in ``order_cols`` order via
    :func:`global_cumsum` of a ones column. Same total-order
    requirement as the other helpers here."""
    out = global_cumsum(df.withColumn("_gc_one", F.lit(1)),
                        order_cols, ["_gc_one"], prefix="_gcix",
                        num_partitions=num_partitions)
    # withColumn/drop return NEW DataFrames that do not carry the
    # _rj_sms_persisted attr track() set inside global_cumsum — re-attach
    # the chain so release() can free the persisted cumsum base
    return track(out.withColumn(id_col, F.col("_gcix__gc_one"))
                 .drop("_gc_one", "_gcix__gc_one"), out)


def global_shift(df: DataFrame, order_cols: list[str],
                 cols: list[str], offset: int = 1,
                 prefix: str | None = None,
                 num_partitions: int | None = None) -> DataFrame:
    """Distributed ``lead``/``lag`` over a global order — the
    scale-safe replacement for ``F.lag(x).over(Window.orderBy(v))``.

    Positive ``offset`` = lead, negative = lag. Built as a dense
    global index (:func:`with_global_index`) plus an equi-join of the
    frame against itself shifted by ``offset`` — one bounded-key
    shuffle instead of a single-task global sort. Adds
    ``{prefix}_<col>`` per shifted column (prefix defaults to
    ``_lead``/``_lag``)."""
    if prefix is None:
        prefix = "_lead" if offset > 0 else "_lag"
    idx = with_global_index(df, order_cols, num_partitions=num_partitions)
    shifted = idx.select(
        (F.col("_gidx") - offset).alias("_gidx"),
        *[F.col(c).alias(f"{prefix}_{c}") for c in cols])
    out = idx.join(shifted, "_gidx", "left")
    return track(out, idx)


def global_running_last(df: DataFrame, order_cols: list[str],
                        value_col: str, out_col: str,
                        num_partitions: int | None = None) -> DataFrame:
    """Distributed ``last(value, ignorenulls=True) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)`` — running last-non-null in a global
    ascending order without a SinglePartition window.

    Two-phase like :func:`global_cumsum`: range-partition on the order
    keys, within-partition running last (a PARTITIONed window), then
    each partition's final non-null value is collected (one bounded
    row per partition), prefix-combined into a per-partition carry on
    the driver, and coalesced back in as a broadcast dim. Descending
    orders: negate the key columns before calling."""
    part = (df.repartitionByRange(num_partitions, *order_cols)
            if num_partitions else df.repartitionByRange(*order_cols))
    base = part.withColumn("_gc_pid", F.spark_partition_id()).persist()
    w = (Window.partitionBy("_gc_pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    local = base.withColumn(
        out_col, F.last(value_col, ignorenulls=True).over(w))
    # per-partition final non-null value = max over (order, value)
    # structs of the non-null rows — bounded rows, driver-combined
    stats = (base.filter(F.col(value_col).isNotNull())
             .groupBy("_gc_pid")
             .agg(F.max(F.struct(*[F.col(c) for c in order_cols],
                                 F.col(value_col).alias("_gc_v")))
                  .alias("_gc_last"))
             .select("_gc_pid", F.col("_gc_last._gc_v").alias("_gc_v"))
             .collect())
    finals = {r["_gc_pid"]: r["_gc_v"] for r in stats}
    carry_rows, carry = [], None
    for pid in range(int(base.rdd.getNumPartitions())):
        carry_rows.append((pid, carry))
        if pid in finals and finals[pid] is not None:
            carry = finals[pid]
    vtype = dict(df.dtypes)[value_col]
    offsets = F.broadcast(df.sparkSession.createDataFrame(
        carry_rows, f"_gc_pid int, _gc_carry {vtype}"))
    out = (local.join(offsets, "_gc_pid")
           .withColumn(out_col,
                       F.coalesce(F.col(out_col), F.col("_gc_carry")))
           .drop("_gc_pid", "_gc_carry"))
    # `df` carries any upstream chain (repartitionByRange dropped it)
    return track(out, base, df)
