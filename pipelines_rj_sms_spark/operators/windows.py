"""Window-function operators (SURVEY §2.6).

- latest_per_key (W1): the reference picks the most recent file per
  (cnes) by date parsed from filename (gcs_to_cloudsql/tasks.py:33-63,
  prontuario_gcs/tasks.py:379-414) — row_number over a desc window.
- top_k / extreme (W4/W5) and ranked threshold listing (W6).

These deliberately use row_number (not dropDuplicates / max+join) so the
result is deterministic under shuffle and computed in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: list[str], order_col: str,
                   tiebreak: list[str] | None = None) -> DataFrame:
    """W1: keep the single most-recent row per key, deterministically."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """W4: global top-k — orderBy+limit plans as TakeOrderedAndProject
    (per-partition partial top-k, tiny driver merge; no full sort)."""
    return df.orderBy(*order).limit(k)


def extreme(df: DataFrame, col: str, largest: bool = True) -> DataFrame:
    """W5: ORDER BY ... LIMIT 1."""
    return df.orderBy(F.col(col).desc() if largest else F.col(col).asc()).limit(1)


def ranked_over_threshold(df: DataFrame, value_col: str, threshold: float,
                          desc: bool = True) -> DataFrame:
    """W6: filter above threshold, rank desc (cost-report shape).

    Ranks come from range-partitioned dense ids
    (`operators/ids.dense_global_ids`), NOT a global row_number
    window: a weak threshold over a huge scan still ranks distributed
    instead of funneling through one partition. Ties order
    stable-arbitrarily within equal values (as the window form did).
    Release the tracked intermediate with `operators.cache.release`.
    """
    from pipelines_rj_sms_spark.operators.ids import dense_global_ids

    filtered = df.filter(F.col(value_col) > threshold)
    key = (-F.col(value_col)).alias("_rk_key") if desc         else F.col(value_col).alias("_rk_key")
    from pipelines_rj_sms_spark.operators.cache import track

    ranked = dense_global_ids(filtered.withColumn("_rk_key", key),
                              ["_rk_key"], id_col="rank")
    out = (ranked.withColumn("rank", (F.col("rank") + 1).cast("int"))
           .drop("_rk_key"))
    return track(out, ranked)  # withColumn drops the tracked-attr chain
