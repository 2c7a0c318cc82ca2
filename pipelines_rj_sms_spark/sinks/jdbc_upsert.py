"""Reverse-ETL JDBC sink with keyed upsert + transient-error retry (K5).

The reference's MySQL loader (bq_to_subpav/utils.py:33-122) batches
INSERT/UPDATE/REPLACE statements, commits per batch, retries deadlocks
with backoff, and validates queries against forbidden keywords. Spark's
JDBC writer has append/overwrite but no upsert, so upsert runs as
foreachPartition with executemany — one DB connection per partition,
batched commits, bounded retries.

The DB driver (mysql-connector etc.) is injected as a connection factory
so tests can pass an in-memory fake (sqlite3) and production passes the
real client; no JDBC jar needed for the Python-side path.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame

FORBIDDEN_KEYWORDS = ("drop ", "truncate ", "delete ", "grant ", "revoke ", "alter ")

# MySQL spellings (the reference's deadlock policy) plus Derby's
# lock-timeout message — the same transient class, and the dialect the
# in-container e2e can actually produce (tests/test_jdbc_read_e2e.py
# provokes a real two-connection lock conflict through the real driver)
TRANSIENT_MARKERS = ("deadlock", "lock wait timeout",
                     "try restarting transaction",
                     "lock could not be obtained",
                     # MySQL error CODES (1205 = lock wait timeout,
                     # 1213 = deadlock): drivers that surface only the
                     # numeric code, or a localized message, still match
                     "(1205,", "(1213,")


def validate_statement(sql: str) -> None:
    """Reject destructive statements (bq_to_subpav/utils.py forbidden-keyword
    guard) — the sink only ever inserts/updates."""
    low = f" {sql.lower()}"
    for kw in FORBIDDEN_KEYWORDS:
        if f" {kw}" in low:
            raise ValueError(f"forbidden keyword in sink statement: {kw.strip()!r}")


def build_upsert_sql(table: str, cols: list[str], key_cols: list[str],
                     dialect: str) -> str:
    """Parameterized upsert statement for one backend dialect (validated
    against the forbidden-keyword guard). Split out of `upsert` so the
    statement shape is unit-testable without a connection."""
    mark = "%s" if dialect in ("mysql", "postgres") else "?"
    placeholders = ", ".join([mark] * len(cols))
    col_list = ", ".join(cols)
    non_keys = [c for c in cols if c not in key_cols]
    if dialect == "mysql":
        updates = ", ".join(f"{c}=VALUES({c})" for c in non_keys)
        sql = (f"INSERT INTO {table} ({col_list}) VALUES ({placeholders}) "
               f"ON DUPLICATE KEY UPDATE {updates}")
    elif dialect in ("postgres", "sqlite"):
        updates = ", ".join(f"{c}=excluded.{c}" for c in non_keys)
        sql = (f"INSERT INTO {table} ({col_list}) VALUES ({placeholders}) "
               f"ON CONFLICT({', '.join(key_cols)}) DO UPDATE SET {updates}")
    elif dialect == "mssql":
        on = " AND ".join(f"t.{k} = src.{k}" for k in key_cols)
        updates = ", ".join(f"t.{c} = src.{c}" for c in non_keys)
        src_vals = ", ".join(f"src.{c}" for c in cols)
        sql = (f"MERGE INTO {table} AS t "
               f"USING (VALUES ({placeholders})) AS src ({col_list}) "
               f"ON {on} "
               f"WHEN MATCHED THEN UPDATE SET {updates} "
               f"WHEN NOT MATCHED THEN INSERT ({col_list}) "
               f"VALUES ({src_vals});")
    else:
        raise ValueError(f"unknown dialect: {dialect!r}")
    validate_statement(sql)
    return sql


def upsert(df: DataFrame, table: str, key_cols: list[str],
           connection_factory: Callable[[], object],
           batch_size: int = 1000, max_retries: int = 5,
           backoff_s: float = 0.5, dialect: str = "mysql") -> None:
    """Keyed upsert via foreachPartition + executemany.

    One statement shape per backend the reference writes to
    (smsrio MySQL, prontuario Postgres, vitacare MSSQL; sqlite = tests):
      mysql    -> INSERT ... ON DUPLICATE KEY UPDATE          (%s params)
      postgres -> INSERT ... ON CONFLICT(key) DO UPDATE        (%s params)
      sqlite   -> INSERT ... ON CONFLICT(key) DO UPDATE        (? params)
      mssql    -> MERGE INTO ... USING (VALUES ...) src        (? params)
    Batches commit independently; transient errors (deadlocks) retry with
    linear backoff, mirroring the reference's _execute_batches policy.
    """
    sql = build_upsert_sql(table, df.columns, key_cols, dialect)

    def write_partition(rows) -> None:
        conn = connection_factory()
        cur = conn.cursor()
        batch: list[tuple] = []

        def commit_batch() -> None:
            cur.executemany(sql, batch)
            conn.commit()
            batch.clear()

        def flush() -> None:
            if not batch:
                return
            execute_with_retry(commit_batch, rollback=conn.rollback,
                               max_retries=max_retries,
                               backoff_s=backoff_s)

        for row in rows:
            batch.append(tuple(row))
            if len(batch) >= batch_size:
                flush()
        flush()
        conn.close()

    df.foreachPartition(write_partition)


def append_jdbc(df: DataFrame, url: str, table: str,
                properties: dict[str, str] | None = None) -> None:
    """Plain append path — native Spark JDBC writer (no upsert needed)."""
    df.write.jdbc(url, table, mode="append", properties=properties or {})


def build_merge_sql(table: str, cols: list[str], key_cols: list[str],
                    staging_table: str, quote: str = "") -> str:
    """ANSI MERGE from a staging table into the target — the set-based
    upsert statement (Derby/Postgres 15+/MSSQL/Oracle speak it).
    ``quote`` wraps COLUMN identifiers only: Spark's JDBC writer quotes
    column names when creating the table (so they are case-sensitive,
    e.g. lowercase on Derby) but passes table names through for the
    backend to normalize — pass quoted table names explicitly if yours
    differ."""
    def q(name: str) -> str:
        return f"{quote}{name}{quote}" if quote else name

    non_keys = [c for c in cols if c not in key_cols]
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    updates = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in non_keys)
    col_list = ", ".join(q(c) for c in cols)
    src_vals = ", ".join(f"s.{q(c)}" for c in cols)
    sql = (f"MERGE INTO {table} t USING {staging_table} s ON {on} "
           f"WHEN MATCHED THEN UPDATE SET {updates} "
           f"WHEN NOT MATCHED THEN INSERT ({col_list}) "
           f"VALUES ({src_vals})")
    validate_statement(sql)
    return sql


def execute_with_retry(execute: Callable[[], object],
                       rollback: Callable[[], None] | None = None,
                       max_retries: int = 5,
                       backoff_s: float = 0.5) -> object:
    """The reference's deadlock policy (_execute_batches) factored out:
    transient errors (TRANSIENT_MARKERS) retry with linear backoff,
    anything else raises immediately. Shared by the row-batch upsert
    and the staging MERGE."""
    for attempt in range(max_retries):
        try:
            return execute()
        except Exception as exc:  # noqa: BLE001 — classified below
            msg = str(exc).lower()
            transient = any(m in msg for m in TRANSIENT_MARKERS)
            if not transient or attempt == max_retries - 1:
                raise
            if rollback is not None:
                rollback()
            time.sleep(backoff_s * (attempt + 1))
    raise AssertionError("unreachable")


def upsert_via_staging(spark, df: DataFrame, url: str, table: str,
                       key_cols: list[str], driver: str | None = None,
                       staging_table: str | None = None,
                       quote: str = "", max_retries: int = 5,
                       backoff_s: float = 0.5) -> None:
    """Set-based JDBC upsert through the REAL JDBC driver: executors
    bulk-load a staging table via Spark's native JDBC writer (the fast,
    parallel path), then ONE driver-side MERGE folds it into the
    target over a `java.sql.DriverManager` connection — the same jar
    the cluster's readers use, no Python DB-API needed. At scale this
    beats per-row executemany by orders of magnitude: the database
    executes one set-based statement instead of millions of keyed
    upserts. Transient failures of the MERGE retry under
    `execute_with_retry`; the staging load is idempotent (overwrite).
    """
    staging = staging_table or f"{table}_staging"
    writer = (df.write.format("jdbc").option("url", url)
              .option("dbtable", staging).mode("overwrite"))
    if driver:
        writer = writer.option("driver", driver)
    writer.save()

    sql = build_merge_sql(table, df.columns, key_cols, staging,
                          quote=quote)
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        execute_with_retry(lambda: stmt.executeUpdate(sql),
                           max_retries=max_retries, backoff_s=backoff_s)
    finally:
        conn.close()
