"""Data-quality operators — first-class in the reference (SURVEY §2.10).

Q1 count reconciliation (minhasaude_mongodb/tasks.py:259-300, ±5%),
Q2/Q3 freshness (alerta_atualizacao_tabelas/tasks.py:13-91),
Q4 truncation guard (ser_metabase/tasks.py:211-214),
Q5 replication-date gate (tpc_azure_blob/tasks.py:67-90),
Q6 schema conformance report (vitacare_gdrive/tasks.py:61-264),
Q9 empty guards (utils/tasks.py:950-951).

Checks return a structured CheckResult instead of raising, so pipelines
can choose alert-vs-fail (the reference does both); ``expect`` wrappers
raise for hard gates.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    passed: bool
    details: dict = field(default_factory=dict)

    def expect(self) -> "CheckResult":
        if not self.passed:
            raise AssertionError(f"quality check failed: {self.name}: {self.details}")
        return self


def reconcile_counts(source_count: int, loaded: DataFrame,
                     tolerance: float = 0.05) -> CheckResult:
    """Q1: |loaded - source| / source <= tolerance."""
    loaded_count = loaded.count()
    drift = abs(loaded_count - source_count) / max(source_count, 1)
    return CheckResult(
        "count_reconciliation", drift <= tolerance,
        {"source": source_count, "loaded": loaded_count, "drift": drift},
    )


def truncation_guard(df: DataFrame, cap: int = 1_000_000) -> CheckResult:
    """Q4: a result of exactly `cap` rows signals upstream truncation."""
    # limit(cap+1) bounds the scan: we only need to know if count >= cap.
    n = df.limit(cap + 1).count()
    return CheckResult("truncation_guard", n < cap, {"rows_seen": n, "cap": cap})


def freshness_by_group(df: DataFrame, group_col: str, ts_col: str,
                       max_age_days: int) -> DataFrame:
    """Q3: max(ts) per group + stale flag (A3 shape)."""
    return (
        df.groupBy(group_col)
        .agg(F.max(ts_col).alias("last_seen"))
        .withColumn(
            "is_stale",
            F.datediff(F.current_date(), F.col("last_seen").cast("date")) > max_age_days,
        )
        .orderBy(group_col)
    )


def replication_gate(df: DataFrame, ts_col: str,
                     expected: date | None = None) -> CheckResult:
    """Q5: the newest replication date must be today (else the source
    copy is stale and the run should halt)."""
    expected = expected or date.today()
    row = df.agg(F.max(F.col(ts_col).cast("date")).alias("d")).first()
    got = row["d"] if row else None
    return CheckResult("replication_gate", got == expected,
                       {"expected": str(expected), "got": str(got)})


def schema_conformance(df: DataFrame, expected: dict[str, str]) -> CheckResult:
    """Q6: report missing / extra / mistyped columns vs a contract."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in expected if c not in actual]
    extra = [c for c in actual if c not in expected]
    mistyped = {
        c: {"expected": t, "actual": actual[c]}
        for c, t in expected.items()
        if c in actual and actual[c] != t
    }
    ok = not missing and not mistyped
    return CheckResult("schema_conformance", ok,
                       {"missing": missing, "extra": extra, "mistyped": mistyped})


def non_empty(df: DataFrame) -> CheckResult:
    """Q9: empty-input guard."""
    return CheckResult("non_empty", not df.isEmpty(), {})


def k_anonymity_violations(df: DataFrame, quasi_cols: list[str],
                           k: int = 5) -> DataFrame:
    """Privacy gate for data release: quasi-identifier combinations
    shared by fewer than ``k`` rows — each such group re-identifies its
    members. Health-secretariat exports (the reference's domain) hinge
    on this before any extract leaves the lake; pair with
    functions.privacy.scrub_pii for the free-text columns.

    One hash aggregate on the quasi columns (map-side partial combine);
    returns the violating combinations with their sizes — empty result
    = the release is k-anonymous at this granularity.
    """
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").alias("group_size"))
            .filter(F.col("group_size") < k))


def l_diversity_violations(df: DataFrame, quasi_cols: list[str],
                           sensitive_col: str, ell: int = 2) -> DataFrame:
    """The companion gate to k_anonymity_violations: a k-anonymous
    group still leaks when every member shares the same sensitive value
    (homogeneity attack) — distinct l-diversity requires at least
    ``ell`` distinct sensitive values per quasi-identifier group.

    One hash aggregate (count + count_distinct per quasi group);
    returns violating groups with their size and distinct-sensitive
    count — empty result = the release is l-diverse. Run both gates:
    k-anonymity bounds group size, l-diversity bounds what the group
    reveals.
    """
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").alias("group_size"),
                 F.count_distinct(F.col(sensitive_col))
                 .alias("distinct_sensitive"))
            .filter(F.col("distinct_sensitive") < ell))
