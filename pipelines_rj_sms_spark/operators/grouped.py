"""Per-group Python transforms via applyInPandas (§2.12 surface).

The reference's per-group pandas work (grouped re-computation per AP in
vitacare_api_v2/tasks.py:205-240, per-table routing in the GDB/dump
decoders) maps to ``groupBy(...).applyInPandas`` — each group lands on
one executor as a pandas frame. These are the training-data-pipeline
versions: per-group robust scaling and quantile clipping (feature
normalization per entity/source before training-set export).

Scale note: group = unit of memory. Keys must be chosen so one group
fits an executor (the same constraint the reference's per-AP pandas
loops had per pod); for heavy-tailed groups, pre-salt or fall back to
window expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def normalize_per_group(df: DataFrame, group_cols: list[str], value_col: str,
                        out_col: str = "value_norm") -> DataFrame:
    """Robust per-group scaling: (x - median) / IQR (falls back to 0 when
    the group is constant). Schema = input + out_col double."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(pdf[value_col], errors="coerce")
        med = v.median()
        iqr = v.quantile(0.75) - v.quantile(0.25)
        pdf[out_col] = ((v - med) / iqr).fillna(0.0) if iqr else 0.0
        return pdf

    return df.groupBy(*group_cols).applyInPandas(scale, schema)


def clip_quantiles_per_group(df: DataFrame, group_cols: list[str],
                             value_col: str, lower: float = 0.01,
                             upper: float = 0.99,
                             out_col: str = "value_clipped") -> DataFrame:
    """Winsorize ``value_col`` within each group to [q_lower, q_upper]."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"

    def clip(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(pdf[value_col], errors="coerce")
        lo, hi = v.quantile(lower), v.quantile(upper)
        pdf[out_col] = v.clip(lo, hi)
        return pdf

    return df.groupBy(*group_cols).applyInPandas(clip, schema)
