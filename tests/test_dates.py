from datetime import date, datetime

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.dates import (
    age_years,
    day_windows,
    hour_windows,
    parse_date_multi,
    relative_date,
    safe_to_date,
    working_range,
)


def test_relative_date():
    today = date(2026, 8, 13)
    assert relative_date("today", today) == today
    assert relative_date("yesterday", today) == date(2026, 8, 12)
    assert relative_date("D-7", today) == date(2026, 8, 6)
    assert relative_date("M-1", today) == date(2026, 7, 1)
    assert relative_date("M-8", today) == date(2025, 12, 1)
    assert relative_date("Y-2", today) == date(2024, 1, 1)


def test_working_range():
    start, end = working_range("D-1", date(2026, 8, 13))
    assert start == datetime(2026, 8, 12)
    assert end == datetime(2026, 8, 13)


def test_parse_date_multi(spark):
    df = spark.createDataFrame(
        [("2024-03-15",), ("15/03/2024",), ("2024-03-15 10:30:00",), ("garbage",)],
        ["raw"],
    )
    out = [r["d"] for r in df.select(parse_date_multi("raw").alias("d")).collect()]
    assert out[:3] == [date(2024, 3, 15)] * 3
    assert out[3] is None


def test_safe_to_date(spark):
    df = spark.createDataFrame([("2024-01-02",), ("2024-01-02 03:04:05",), ("x",)], ["raw"])
    out = [r["d"] for r in df.select(safe_to_date("raw").alias("d")).collect()]
    assert out[0] == date(2024, 1, 2)
    assert out[1] == date(2024, 1, 2)
    assert out[2] is None


def test_age_years(spark):
    # reference utils/time.py docstring semantics: birthday not yet reached
    # this year decrements the raw year difference
    df = spark.createDataFrame(
        [("1990-06-15",), ("1990-12-31",), ("2000-01-01",)], ["b"]
    ).select(F.col("b").cast("date").alias("b"))
    as_of = F.lit("2024-06-14").cast("date")
    out = [r["age"] for r in df.select(age_years("b", as_of)).collect()]
    assert out == [33, 33, 24]


def test_day_windows(spark):
    w = day_windows(spark, "2024-01-01", "2024-01-10")
    rows = w.collect()
    assert len(rows) == 10
    assert rows[0]["window_start"] == date(2024, 1, 1)


def test_hour_windows(spark):
    w = hour_windows(spark, "2024-01-01 00:00:00", "2024-01-01 23:59:59", hours=2)
    assert w.count() == 12


def test_window_generators_reject_reversed_range(spark):
    """Spark sequence(a, b) with b < a silently steps backward; the
    generators must error instead of emitting descending windows."""
    import pytest

    from pipelines_rj_sms_spark.functions.dates import (day_windows,
                                                        hour_windows)
    with pytest.raises(ValueError, match="precedes"):
        day_windows(spark, "2024-02-01", "2024-01-01")
    with pytest.raises(ValueError, match="precedes"):
        hour_windows(spark, "2024-02-01 00:00:00", "2024-01-31 00:00:00")
