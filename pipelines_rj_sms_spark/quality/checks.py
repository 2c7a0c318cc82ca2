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


def t_closeness_report(df: DataFrame, quasi_cols: list[str],
                       sensitive_col: str,
                       t: float = 0.2) -> DataFrame:
    """The third gate of the release-privacy trio (k-anonymity bounds
    group size, l-diversity bounds value variety, t-closeness bounds
    DISTRIBUTION skew): a group whose sensitive-value distribution
    sits far from the table-wide distribution leaks attribute
    inference even when diverse (the classic salary example — all of
    a group's values being "high" tells you plenty). Distance is the
    Earth Mover's Distance over the ORDERED sensitive domain with the
    standard 1/(m-1) rank normalization (Li, Li & Venkatasubramanian
    2007, public):

        EMD(Q, P) = Σ_i |cumQ_i − cumP_i| / (m − 1)

    where the cumulative sums run over the m distinct sensitive values
    in order. Continuous attributes should be bucketed first (deciles
    via `analytics.equi_depth_histogram` boundaries) so m stays small.

    Shape: one (quasi, value) hash rollup + one value rollup, a
    groups×m densified grid built by joining the DISTINCT frames (both
    collapsed — never the data), cumulative window sums over the grid,
    and a det-quantized |diff| sum (functions/numeric.py) so the EMD
    replays bit-identically cross-engine. Returns one row per group:
    (quasi..., group_size, emd, violates) with emd rounded to 6 —
    filter ``violates`` for the gate, keep the full report for audit.
    """
    from pyspark.sql import Window

    from pipelines_rj_sms_spark.functions.numeric import det_sum

    s = F.col(sensitive_col)
    joint = (df.groupBy(*quasi_cols, s.alias("_v"))
             .agg(F.count("*").alias("_n")))
    joint = joint.persist()
    vals = (joint.groupBy("_v").agg(F.sum("_n").alias("_gn")))
    total = F.broadcast(vals.agg(
        F.sum("_gn").alias("_tot"),
        F.count("*").alias("_m")))
    groups = (joint.groupBy(*quasi_cols)
              .agg(F.sum("_n").alias("group_size")))
    grid = (groups.crossJoin(vals.crossJoin(total))
            .join(joint, [*quasi_cols, "_v"], "left")
            .na.fill({"_n": 0}))
    wq = (Window.partitionBy(*quasi_cols)
          .orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum_q = F.sum("_n").over(wq) / F.col("group_size")
    cum_p = (F.sum("_gn").over(wq) / F.col("_tot"))
    term = F.abs(cum_q - cum_p)
    out = (grid
           .select(*quasi_cols, "group_size", "_m", term.alias("_t"))
           .groupBy(*quasi_cols)
           .agg(F.first("group_size").alias("group_size"),
                F.round(
                    F.when(F.first("_m") > 1,
                           det_sum(F.col("_t"))
                           / (F.first("_m") - 1))
                    .otherwise(F.lit(0.0)), 6).alias("emd")))
    from pipelines_rj_sms_spark.operators.cache import track
    return track(
        out.withColumn("violates", F.col("emd") > F.lit(float(t)))
        .orderBy(*quasi_cols),
        joint)
