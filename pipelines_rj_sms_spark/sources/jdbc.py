"""Partitioned JDBC reader — collapses the reference's hand-rolled
pagination (S1-S5 in SURVEY §2.1) into Spark's native partitioned read.

The reference pages with LIMIT/OFFSET batches of 50k
(smsrio_mysql/tasks.py:17-52), datetime windows (vitai_db/tasks.py:100-157)
and 500k read_sql chunks (vitacare_historico/tasks.py:58). Spark's JDBC
source does the same slicing natively with partitionColumn/lower/upper/
numPartitions and pushes time-window predicates into the source SQL — so
the whole S1-S5 family is one function.

No JDBC driver jar ships in this container, so these build the reader and
are exercised by plan-construction tests; execution needs a driver on the
classpath (standard spark-submit --jars).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


@dataclass
class JdbcSource:
    url: str                      # jdbc:mysql://... / jdbc:sqlserver://...
    table: str                    # schema.table
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    partition_column: str | None = None   # numeric/date column for slicing
    num_partitions: int = 8
    fetch_size: int = 50_000      # reference's page size as row-fetch hint


def _base_reader(spark: SparkSession, src: JdbcSource) -> DataFrameReader:
    reader = (
        spark.read.format("jdbc")
        .option("url", src.url)
        .option("fetchsize", src.fetch_size)
    )
    if src.user:
        reader = reader.option("user", src.user)
    if src.password:
        reader = reader.option("password", src.password)
    if src.driver:
        reader = reader.option("driver", src.driver)
    return reader


def read_table(spark: SparkSession, src: JdbcSource,
               lower: int | None = None, upper: int | None = None) -> DataFrame:
    """S1/S2: full-table scan, partitioned on src.partition_column when
    bounds are known (Spark emits numPartitions range-predicate queries —
    the LIMIT/OFFSET pagination, minus the O(n^2) OFFSET cost)."""
    reader = _base_reader(spark, src).option("dbtable", src.table)
    if src.partition_column and lower is not None and upper is not None:
        reader = (
            reader.option("partitionColumn", src.partition_column)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(src.num_partitions))
        )
    return reader.load()


def read_window(spark: SparkSession, src: JdbcSource, ts_col: str,
                start: datetime, end: datetime) -> DataFrame:
    """S3: incremental window extraction — the BETWEEN predicate goes into
    the pushed-down query so the source DB does the filtering (P3)."""
    query = (
        f"SELECT * FROM {src.table} "
        f"WHERE {ts_col} BETWEEN '{start:%Y-%m-%d %H:%M:%S}' "
        f"AND '{end:%Y-%m-%d %H:%M:%S}'"
    )
    return _base_reader(spark, src).option("query", query).load()
