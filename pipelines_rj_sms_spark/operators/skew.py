"""Skew mitigation for joins at scale — salting + bucketing helpers.

AQE's skew-join splitting (on in the session defaults) handles sort-merge
skew automatically; these are the explicit tools for the cases AQE can't
fix: a hot key that must hash-join against a non-broadcastable side, and
repeat joins on the same key that should shuffle once, not per query.

- salted_join: probe side gets a uniform random salt in [0, salt), build
  side is exploded salt-times, join key becomes (key, salt). The hot
  key's rows spread over ``salt`` reducers at the cost of replicating
  the build side salt-fold — use when build is small-ish but above the
  broadcast threshold and probe has heavy keys.
- write_bucketed / read_bucketed: persist a table hash-bucketed (and
  sorted) by the join key so later joins are exchange-free on that side
  (bucketed scan -> sort-merge join with zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, on: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join on ``on`` with the key salted ``salt`` ways.

    Semantics identical to probe.join(build, on, how) for inner/left
    joins with unique build keys (every probe row meets every matching
    build row exactly once, under exactly one salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics proof "
                         "relies on probe-side salt uniqueness)")
    salt_col = (F.rand(seed=42) * salt).cast("int")
    p = probe.withColumn("_salt", salt_col)
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = p.join(b, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(df: DataFrame, table_name: str,
                   bucket_col: str | list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist hash-bucketed + sorted by the join key (catalog table —
    bucket metadata lives in the metastore, so later reads skip the
    exchange on this side of a join/aggregation).

    ``bucket_col`` may be one column or a composite key list;
    ``sort_cols`` defaults to the bucket key (pass extra columns to
    also pre-sort for merge-join or range pruning within buckets).
    Pick ``n_buckets`` so one bucket of the LARGER table fits an
    executor scan partition (~bytes/128 MiB); co-location requires
    both sides to use the same count, so size for the fact table.

    Note the planner only *uses* the bucketed layout when it picks a
    shuffle join — at toy scale a broadcastable dim bypasses it (scan
    shows "Bucketed: false (disabled by query planner)"); the test
    pins the fact-fact case with a merge hint."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *cols)
        .sortBy(*(sort_cols or cols))
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def key_skew_report(df: DataFrame, key_cols: list[str],
                    top_n: int = 20) -> DataFrame:
    """Shuffle-skew diagnosis for a prospective join/agg key: the
    ``top_n`` heaviest key values with their row share and cumulative
    share, plus each key's ratio to the mean group size. A top key
    holding >1% of a 100 TB table is the salt/split candidate the AQE
    skew threshold will otherwise discover at runtime — this report
    finds it BEFORE the job, from one hash aggregation over the key.

    Output: (key..., cnt, share, cum_share, x_mean, rank). Totals ride
    as a broadcast one-row aggregate; the ranking window sees only the
    collapsed per-key counts.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    totals = F.broadcast(counts.agg(
        F.sum("cnt").cast("double").alias("_rows"),
        F.count("*").cast("double").alias("_keys")))
    order = [F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols]]
    # sort+limit compiles to TakeOrderedAndProject (per-partition
    # partial top-N + driver merge) — the ranking window then only ever
    # sees top_n rows, never the full key spectrum
    top = counts.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (top.crossJoin(totals)
            .withColumn("rank", F.row_number().over(w))
            .select(*key_cols, "cnt",
                    (F.col("cnt") / F.col("_rows")).alias("share"),
                    (F.sum("cnt").over(wcum) / F.col("_rows"))
                    .alias("cum_share"),
                    (F.col("cnt") * F.col("_keys") / F.col("_rows"))
                    .alias("x_mean"),
                    "rank"))
