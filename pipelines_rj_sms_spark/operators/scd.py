"""Slowly-changing-dimension history building (SCD type 2).

The reference maintains keyed "latest state" tables by re-ingesting
full snapshots and keeping the newest row per key (keep-last W3
semantics, e.g. prontuario upserts). What it cannot answer is "what
was this key's state at time T?" — the classic SCD2 question every
warehouse bolts on eventually. This module derives validity-interval
history directly from an observation log: one row per *run* of
consecutive identical state per key, with ``valid_from``/``valid_to``
bounds (gaps-and-islands compression).

100 TB design: ONE shuffle. Both windows partition by the key only —
run starts are detected with lag(), and run aggregates (first ts,
observation count) are recovered from the *next* run-start's position
instead of a second (key, island) aggregation, so Spark never
re-exchanges on a composite key. Rows carried through the shuffle are
the observation rows themselves; output is one row per state change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compress_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: list[str] | str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an observation log into SCD2 validity intervals.

    Each output row is a maximal run of consecutive observations of
    ``key_col`` whose ``state_cols`` are all (null-safely) identical:

    - ``valid_from`` — timestamp of the run's first observation;
    - ``valid_to``   — timestamp of the *next* run's first observation
      (exclusive bound), null for the key's current state;
    - ``n_obs``      — observations inside the run;
    - ``is_current`` — valid_to is null.

    Ordering within a key is (ts, tiebreak) so same-timestamp
    observations are deterministic under shuffle; ``tiebreak_col``
    defaults to the first state column.

    Plan shape: one Exchange on ``key_col``; the second window orders
    by a row_number computed in the first, so it reuses the sort with
    no further shuffle.
    """
    if isinstance(state_cols, str):
        state_cols = [state_cols]
    tb = tiebreak_col or state_cols[0]
    w = Window.partitionBy(key_col).orderBy(ts_col, tb)
    wk = Window.partitionBy(key_col)

    same = F.lit(True)
    for c in state_cols:
        same = same & F.lag(c).over(w).eqNullSafe(F.col(c))
    rn = F.row_number().over(w)

    marked = df.select(
        key_col, ts_col, *state_cols,
        rn.alias("_rn"),
        F.count(F.lit(1)).over(wk).alias("_cnt"),
        ((F.row_number().over(w) == 1) | ~same).alias("_chg"),
    )

    starts = marked.filter(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy("_rn")
    nxt_rn = F.lead("_rn").over(w2)
    return starts.select(
        key_col,
        *state_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        (F.coalesce(nxt_rn, F.col("_cnt") + 1) - F.col("_rn")).alias("n_obs"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def merge_history(history: DataFrame, new_obs: DataFrame,
                  key_col: str, ts_col: str,
                  state_cols: list[str] | str,
                  tiebreak_col: str | None = None) -> DataFrame:
    """Incrementally merge an append-only observation batch into an
    existing compressed history — the partition-scoped companion of
    `compress_history` (same posture as the lakehouse merge_upsert and
    the incremental LSH store: never recompute the world).

    Only keys PRESENT IN THE BATCH are recompressed; everyone else's
    intervals pass through untouched. Affected keys' history rows are
    expanded to synthetic observations (each run contributes its
    valid_from timestamp n_obs times — ordering and counts are all
    compress_history consumes, so the expansion is lossless for
    append-only batches where new timestamps follow the key's
    history), unioned with the batch, and recompressed. Cost scales
    with the batch's key set, not the history.

    Requires batch timestamps at/after each key's last valid_from
    (append-only CDC delivery — the common case; late-arriving
    corrections need a full recompress of the affected keys from the
    raw log).
    """
    if isinstance(state_cols, str):
        state_cols = [state_cols]
    touched = new_obs.select(key_col).distinct()
    untouched = history.join(touched, key_col, "left_anti")
    affected = history.join(touched, key_col, "left_semi")
    synthetic = affected.select(
        key_col, *state_cols,
        F.col("valid_from").alias(ts_col),
        F.explode(F.sequence(
            F.lit(1).cast("long"),
            F.col("n_obs").cast("long"))).alias("_tb"))
    tb = tiebreak_col or state_cols[0]
    # offset past any synthetic index so same-timestamp batch rows sort
    # after the expanded history rows deterministically
    batch = new_obs.select(
        key_col, *state_cols, ts_col,
        (F.row_number().over(
            Window.partitionBy(key_col).orderBy(ts_col, tb))
         + F.lit(1_000_000_000)).cast("long").alias("_tb"))
    combined = synthetic.unionByName(batch)
    redone = compress_history(combined, key_col, ts_col, state_cols, "_tb")
    return untouched.unionByName(redone)


def state_at(history: DataFrame, ts, key_col: str | None = None) -> DataFrame:
    """Point-in-time lookup against a compressed history: the rows
    whose interval contains ``ts`` (valid_from <= ts < valid_to, with
    null valid_to open-ended). A plain filter — partition-prunable when
    the history is stored partitioned by date(valid_from)."""
    t = F.lit(ts).cast("timestamp")
    out = history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
    return out
