"""Lakehouse sink — the reference's create/append/overwrite semantics
(K1/K2, utils/tasks.py:812-1001) over partitioned Parquet.

Partition layout is the reference's exact Hive scheme
ano_particao=YYYY/mes_particao=M/data_particao=YYYY-MM-DD
(utils/tasks.py:773, 1276-1309), so partition pruning on any of the three
levels is free. ``overwrite`` relies on dynamic partitionOverwriteMode
(session default) so a daily re-run replaces only its own date partitions
— the behavior the reference implements by deleting per-date folders.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pipelines_rj_sms_spark.operators.conform import with_date_partitions

PARTITION_COLS = ["ano_particao", "mes_particao", "data_particao"]


def write_table(df: DataFrame, path: str, mode: str = "append",
                ts_col: str | None = None,
                partition: bool = True) -> None:
    """K1/K2: write a batch to the lakehouse.

    mode='append'  -> add files to existing partitions
    mode='overwrite' -> replace only the partitions present in ``df``
    Empty inputs short-circuit (Q9, utils/tasks.py:950-951).
    """
    if df.isEmpty():
        return
    writer = df.write.mode(mode)
    if partition:
        if ts_col is not None:
            df = with_date_partitions(df, ts_col)
            writer = df.write.mode(mode)
        present = [c for c in PARTITION_COLS if c in df.columns]
        if present:
            writer = writer.partitionBy(*present)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Partition-discovering read of a lakehouse table."""
    return spark.read.option("basePath", path).parquet(path)


def table_exists(path: str) -> bool:
    return os.path.exists(path)
