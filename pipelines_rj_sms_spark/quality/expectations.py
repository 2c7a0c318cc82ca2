"""Declarative column expectations — the data-contract gate.

The reference's quality checks are bespoke per-flow (count deltas,
freshness thresholds scattered through tasks); the platform form is a
declarative suite (the Great Expectations / Deequ pattern, public):
callers state per-column predicates and tolerated violation rates, the
engine evaluates EVERY expectation in ONE conditional hash aggregation
over a single scan — never a job per check — and returns a tidy report
row per expectation.

Expectation kinds (all expression-level; no Python in the scan):
- ``not_null``            null fraction must be <= tolerance
- ``unique``              duplicate fraction must be <= tolerance
- ``between(lo, hi)``     out-of-range fraction (nulls don't count)
- ``isin(values)``        out-of-set fraction (nulls don't count)
- ``matches(regex)``      non-matching fraction (nulls don't count)
- ``custom(column_expr)`` violation = rows where the boolean expr is
  FALSE (nulls count as violations)

``unique`` is the one expectation a single pass can't answer from
per-row predicates; it rides in the same job as one extra
count_distinct in the same aggregate (Spark plans it as an expand —
still one scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Expectation", "not_null", "unique", "between", "isin",
           "matches", "custom", "run_expectations"]


@dataclass
class Expectation:
    name: str
    column: str
    kind: str
    tolerance: float = 0.0
    params: dict = field(default_factory=dict)

    def violation(self) -> Column | None:
        """Boolean per-row violation expression (None for `unique`)."""
        c = F.col(self.column)
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "between":
            lo, hi = self.params["lo"], self.params["hi"]
            return c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
        if self.kind == "isin":
            return c.isNotNull() & ~c.isin(list(self.params["values"]))
        if self.kind == "matches":
            return c.isNotNull() & ~c.rlike(self.params["regex"])
        if self.kind == "custom":
            return ~F.coalesce(self.params["expr"], F.lit(False))
        if self.kind == "unique":
            return None
        raise ValueError(f"unknown expectation kind: {self.kind}")


def not_null(column: str, tolerance: float = 0.0) -> Expectation:
    return Expectation(f"{column}_not_null", column, "not_null", tolerance)


def unique(column: str, tolerance: float = 0.0) -> Expectation:
    return Expectation(f"{column}_unique", column, "unique", tolerance)


def between(column: str, lo, hi, tolerance: float = 0.0) -> Expectation:
    return Expectation(f"{column}_between", column, "between", tolerance,
                       {"lo": lo, "hi": hi})


def isin(column: str, values, tolerance: float = 0.0) -> Expectation:
    return Expectation(f"{column}_isin", column, "isin", tolerance,
                       {"values": list(values)})


def matches(column: str, regex: str, tolerance: float = 0.0) -> Expectation:
    return Expectation(f"{column}_matches", column, "matches", tolerance,
                       {"regex": regex})


def custom(name: str, expr: Column, tolerance: float = 0.0) -> Expectation:
    return Expectation(name, "_", "custom", tolerance, {"expr": expr})


def run_expectations(df: DataFrame,
                     expectations: list[Expectation]) -> DataFrame:
    """Evaluate the whole suite in one scan; returns one row per
    expectation: (expectation, n_rows, n_violations, violation_rate,
    passed), rate rounded to 6. Row order is the suite order via an
    explicit rank column so downstream sorts are deterministic.
    """
    aggs = [F.count("*").alias("_n")]
    for e in expectations:
        v = e.violation()
        if v is None:
            aggs.append(
                (F.count(F.col(e.column))
                 - F.count_distinct(F.col(e.column)))
                .alias(f"_v_{e.name}"))
        else:
            aggs.append(
                F.sum(v.cast("long")).alias(f"_v_{e.name}"))
    wide = df.agg(*aggs)
    # unpivot via ONE explode over the single aggregate row — a union
    # of per-expectation selects would replay the scan per branch
    entries = F.array(*[
        F.struct(F.lit(i).alias("rank"),
                 F.lit(e.name).alias("expectation"),
                 F.col(f"_v_{e.name}").cast("bigint")
                 .alias("n_violations"),
                 F.lit(float(e.tolerance)).alias("tol"))
        for i, e in enumerate(expectations)])
    rate = F.when(F.col("n_rows") > 0,
                  F.col("n_violations") / F.col("n_rows")) \
        .otherwise(F.lit(0.0))
    return (wide.select(F.col("_n"), F.explode(entries).alias("_e"))
            .select(F.col("_e.rank").alias("rank"),
                    F.col("_e.expectation").alias("expectation"),
                    F.col("_n").alias("n_rows"),
                    F.col("_e.n_violations").alias("n_violations"),
                    F.col("_e.tol").alias("_tol"))
            .select("rank", "expectation", "n_rows", "n_violations",
                    F.round(rate, 6).alias("violation_rate"),
                    (rate <= F.col("_tol")).alias("passed")))
