"""Keyed snapshot diffing — change-data-capture without a changelog.

The reference re-ingests full source snapshots and overwrites
(datalake upsert flows); what that loses is the *diff*: which rows
appeared, vanished, or changed between loads — the input to targeted
reprocessing, audit trails, and cheap incremental downstream updates.
This operator derives it from any two keyed snapshots.

Scale shape: each side is collapsed to (key, row_hash) — the hash is
a single xxhash64 over the compared columns, computed in the scan
projection, so the shuffle carries 16-byte pairs, never row bodies.
One full outer join on the key classifies every key as
inserted/deleted/changed/unchanged; the changed/inserted payloads are
recovered by a final semi-join against the new snapshot (bodies move
only for keys that actually changed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, cols: list[str]):
    # null-safe: hash the string rendering with a per-column null
    # sentinel, so (NULL) != ('') and column order is pinned
    return F.xxhash64(*[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
        for c in cols])


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """(key..., change) for every key present in either snapshot:
    ``inserted`` (new only), ``deleted`` (old only), ``changed``
    (both, differing ``compare_cols``), ``unchanged``. Keys must be
    unique per snapshot (enforce with dedup_keep_last upstream).

    ``compare_cols`` defaults to all non-key columns shared by both
    sides. One shuffle per side on the key; 16 bytes per row.
    """
    if compare_cols is None:
        shared = [c for c in new.columns
                  if c in set(old.columns) and c not in set(key_cols)]
        compare_cols = shared
    o = old.select(*key_cols, _row_hash(old, compare_cols).alias("_oh"))
    n = new.select(*key_cols, _row_hash(new, compare_cols).alias("_nh"))
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_oh").isNull(), F.lit("inserted"))
        .when(F.col("_nh").isNull(), F.lit("deleted"))
        .when(F.col("_oh") == F.col("_nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed")))
    return j.select(*key_cols, change.alias("change"))


def changed_rows(old: DataFrame, new: DataFrame, key_cols: list[str],
                 compare_cols: list[str] | None = None,
                 include_inserts: bool = True) -> DataFrame:
    """The new snapshot's full rows for keys classified changed (and
    optionally inserted) — the minimal payload a downstream incremental
    job must reprocess. Bodies are joined in ONLY for those keys."""
    kinds = ["changed", "inserted"] if include_inserts else ["changed"]
    keys = (snapshot_diff(old, new, key_cols, compare_cols)
            .filter(F.col("change").isin(kinds))
            .select(*key_cols))
    return new.join(keys, key_cols, "left_semi")


def apply_changes(snapshot: DataFrame, changes: DataFrame,
                  key_cols: list[str], op_col: str = "op",
                  order_col: str = "ts",
                  delete_op: str = "D") -> DataFrame:
    """Apply a CDC change log onto a keyed snapshot — the inverse of
    :func:`snapshot_diff` (and the batch form of Delta's MERGE /
    `APPLY CHANGES INTO`): the LAST change per key wins (ordered by
    ``order_col``, ties broken by preferring the delete so a
    delete+reinsert at the same instant is conservative), deletes drop
    the key, anything else upserts the change row's payload.

    Scale shape: the change log collapses to one row per key via the
    keep-last window (narrow — only changed keys move); survivors =
    snapshot LEFT-ANTI the changed keys (ships 8-byte keys) UNION the
    non-delete winners. Both shuffles key on ``key_cols``; untouched
    snapshot rows are never rewritten, re-sorted, or re-hashed beyond
    the anti-join probe. Output schema = snapshot schema.
    """
    data_cols = [c for c in snapshot.columns]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        F.col(order_col).desc(),
        (F.col(op_col) == F.lit(delete_op)).desc())
    latest = (changes.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") == 1).drop("_rk"))
    survivors = snapshot.join(latest.select(*key_cols), key_cols,
                              "left_anti")
    upserts = (latest.filter(F.col(op_col) != F.lit(delete_op))
               .select(*data_cols))
    return survivors.unionByName(upserts)
