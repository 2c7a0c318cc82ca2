"""Join helpers encoding the reference's join semantics (SURVEY §2.4).

- remaining_work: the progress anti-join (utils/progress.py:107-140, J1/U4)
  — resumable fan-out = candidates LEFT ANTI progress on operator_key.
- lookup: broadcast dimension join (utils/sms.py:8-40, J4) — the master
  `estabelecimento` table is small; broadcast() makes it a map-side hash
  join with zero shuffle of the fact side.
- coalesce_join: the positional addr/cep coalesce (J3) as a keyed join +
  coalesce, the shuffle-safe equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remaining_work(candidates: DataFrame, progress: DataFrame,
                   key: str = "operator_key") -> DataFrame:
    """J1: candidates minus already-done keys (left anti join)."""
    return candidates.join(progress.select(key).distinct(), key, "left_anti")


def lookup(fact: DataFrame, dim: DataFrame, on: str | list[str],
           how: str = "left") -> DataFrame:
    """J4: broadcast-hash lookup join against a bounded dimension."""
    return fact.join(F.broadcast(dim), on, how)


def coalesce_join(left: DataFrame, right: DataFrame, on: str | list[str],
                  prefer: dict[str, str]) -> DataFrame:
    """J3: join + per-column coalesce(left_col, right_col) -> out_col.

    ``prefer`` maps output column -> right-side fallback column; the
    left-side column of the same output name wins when non-null.
    """
    keys = [on] if isinstance(on, str) else on
    l, r = left.alias("l"), right.alias("r")
    joined = l.join(r, keys, "left")
    cols = [F.col(f"l.{c}") for c in left.columns if c not in prefer]
    for out_col, fallback in prefer.items():
        cols.append(F.coalesce(F.col(f"l.{out_col}"), F.col(f"r.{fallback}")).alias(out_col))
    return joined.select(*cols)


def seen_keys_filter(df: DataFrame, seen: DataFrame,
                     key_cols: list[str]) -> DataFrame:
    """J5: drop rows whose composite key already exists in ``seen``
    (the `concat(id,cpf) NOT IN (...)` pattern) — anti join on the
    natural columns, no concat needed (null-safe, pushdown-friendly)."""
    return df.join(seen.select(*key_cols).distinct(), key_cols, "left_anti")
