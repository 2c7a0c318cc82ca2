"""Resumable fan-out progress state (O1) — the reference's progress table
(pipelines/utils/progress.py:22-140) as a small parquet state table +
anti-join.

A manager run builds a candidate table of operator_keys (C16), asks
``remaining`` what still needs doing (left anti vs recorded keys), fans
out, and each finished operator calls ``record_done``. Idempotent re-runs
come free: done keys drop out of ``remaining``. At scale the state table
stays tiny (one short row per completed work unit) and the anti-join
broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.joins import remaining_work


def record_done(spark: SparkSession, state_path: str, keys: list[str],
                run_id: str | None = None) -> None:
    """Append completed operator_keys to the state table (append-only —
    concurrent writers never conflict on parquet file level)."""
    if not keys:
        return
    df = spark.createDataFrame([(k,) for k in keys], "operator_key string")
    df = df.withColumn("completed_at", F.current_timestamp())
    if run_id is not None:
        df = df.withColumn("run_id", F.lit(run_id))
    df.coalesce(1).write.mode("append").parquet(state_path)


def load_progress(spark: SparkSession, state_path: str) -> DataFrame:
    """The recorded keys; empty DataFrame when no state exists yet."""
    try:
        return spark.read.parquet(state_path).select("operator_key")
    except Exception:  # AnalysisException: path does not exist (first run)
        return spark.createDataFrame([], "operator_key string")


def remaining(spark: SparkSession, state_path: str,
              candidates: DataFrame, key: str = "operator_key") -> DataFrame:
    """Candidates minus recorded keys (J1 anti-join; broadcast-sized)."""
    return remaining_work(candidates, load_progress(spark, state_path), key)
