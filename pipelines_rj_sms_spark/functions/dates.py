"""Date/time semantics of the reference, as Spark Column expressions.

Parity targets:
- relative-date algebra D-n / M-n / Y-n / today / yesterday:
  pipelines/utils/time.py:15-36, pipelines/utils/basics.py:30-51 (C5)
- multi-format parsing (ISO, dd/MM/yyyy, dayfirst fallback):
  pipelines/utils/time.py:119-166 (C8)
- age from birthdate (year diff minus not-yet-birthday flag):
  pipelines/utils/time.py:169-232 (C9)
- safe coalesced date casts (SAFE_CAST chain):
  pipelines/datalake/migrate/bq_to_subpav/tasks.py:70-113 (P4)
- datetime window fan-out: pipelines/datalake/extract_load/vitai_db/
  tasks.py:32-56, cientificalab_api/tasks.py:203-248 (C6)

All pure expressions — no UDFs.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def relative_date(spec: str, today: date | None = None) -> date:
    """Driver-side relative-date algebra: 'D-3', 'M-1', 'Y-2', 'today',
    'yesterday' -> a concrete date. M/Y truncate to period start, matching
    the reference's month/year arithmetic.
    """
    today = today or date.today()
    s = spec.strip().lower()
    if s in ("today", "now", "d-0"):
        return today
    if s == "yesterday":
        return today - timedelta(days=1)
    m = re.fullmatch(r"([dmy])-(\d+)", s)
    if not m:
        raise ValueError(f"bad relative date spec: {spec!r}")
    unit, n = m.group(1), int(m.group(2))
    if unit == "d":
        return today - timedelta(days=n)
    if unit == "m":
        y, mo = divmod(today.month - 1 - n, 12)
        return date(today.year + y, mo + 1, 1)
    y = today.year - n
    return date(y, 1, 1)


def parse_date_multi(col: Column | str) -> Column:
    """C8: try ISO, then dd/MM/yyyy, then a timestamp parse, null on failure."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")).cast("date"),
        F.try_to_timestamp(c).cast("date"),
    )


def safe_to_date(col: Column | str) -> Column:
    """P4: COALESCE(SAFE_CAST date, date(SAFE_CAST datetime)) equivalent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("date"), c.try_cast("timestamp").cast("date"))


def age_years(birth: Column | str, as_of: Column | None = None) -> Column:
    """C9: whole years elapsed, decrementing when the birthday hasn't
    occurred yet this year (reference utils/time.py:169-232 semantics,
    validated against its docstring examples in tests).
    """
    b = F.col(birth) if isinstance(birth, str) else birth
    ref = as_of if as_of is not None else F.current_date()
    not_yet = (
        (F.month(ref) < F.month(b))
        | ((F.month(ref) == F.month(b)) & (F.dayofmonth(ref) < F.dayofmonth(b)))
    ).cast("int")
    return (F.year(ref) - F.year(b) - not_yet).alias("age")


def _check_window_order(start: str, end: str) -> None:
    """Spark `sequence(a, b)` with b < a silently steps BACKWARD —
    a reversed backfill range would emit descending windows instead of
    erroring. Guard driver-side where the bounds are parseable."""
    try:
        s, e = date.fromisoformat(start[:10]), date.fromisoformat(end[:10])
    except ValueError:
        return  # non-ISO spellings: let Spark's cast semantics decide
    if e < s:
        raise ValueError(f"window end {end!r} precedes start {start!r}")


def day_windows(spark: SparkSession, start: str, end: str) -> DataFrame:
    """C6: one row per day in [start, end] — `sequence` + `explode`,
    computed on executors (no driver loop), so a 10-year backfill plan
    is still a single narrow stage.
    """
    _check_window_order(start, end)
    return spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
        ).alias("window_start")
    ).withColumn("window_end", F.date_add("window_start", 1))


def hour_windows(spark: SparkSession, start: str, end: str, hours: int = 2) -> DataFrame:
    """C6: tumbling N-hour extraction windows (cientificalab 2h pattern)."""
    _check_window_order(start, end)
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"interval {hours} hours"),
            )
        ).alias("window_start")
    ).withColumn("window_end", F.col("window_start") + F.expr(f"interval {hours} hours"))


def working_range(spec: str, today: date | None = None) -> tuple[datetime, datetime]:
    """Reference get_datetime_working_range: [relative_date 00:00, today 00:00)."""
    start = relative_date(spec, today)
    today = today or date.today()
    return (
        datetime(start.year, start.month, start.day),
        datetime(today.year, today.month, today.day),
    )
