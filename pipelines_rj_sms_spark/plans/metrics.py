"""Execution metrics + cost reporting (O10).

The reference estimates BigQuery cost from INFORMATION_SCHEMA.JOBS
bytes-billed at $6.25/TiB (datalake/transform/dbt/tasks.py:152-205) and
alerts on jobs above a threshold (reports/alerta_jobs_caros/tasks.py:
13-46). The Spark analog: read the executed plan's SQL metrics after an
action and report bytes scanned / rows output per scan, priced with the
same published constant so reports stay comparable.

Works post-hoc on any DataFrame that has executed (metrics are zero
before an action) — no listener registration needed, so it also works
over Spark Connect-less py4j sessions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

USD_PER_TIB = 6.25  # reference's published constant


@dataclass
class ScanMetric:
    node: str
    rows: int
    bytes_read: int


def execute_for_metrics(df: DataFrame) -> int:
    """Execute the DataFrame's own QueryExecution without driver-side
    materialization (JVM toRdd().count() — derived actions like
    df.count() build a *different* plan whose metrics don't attach here).
    Returns the row count as a byproduct."""
    return int(df._jdf.queryExecution().toRdd().count())


def scan_metrics(df: DataFrame, execute: bool = False) -> list[ScanMetric]:
    """Per-leaf-scan (rows, bytes) from the executed plan's SQLMetrics.

    Metrics attach to this exact Dataset's QueryExecution: populate them
    with ``execute=True``, or call after df.collect()/df.write on the
    same object. Derived actions (df.count()) execute a different plan
    and leave these at zero.
    """
    if execute:
        execute_for_metrics(df)
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    out: list[ScanMetric] = []
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        metrics = leaf.metrics()
        it = metrics.iterator()
        rows = bytes_read = 0
        while it.hasNext():
            kv = it.next()
            name, metric = kv._1(), kv._2()
            if name == "numOutputRows":
                rows = metric.value()
            elif name in ("filesSize", "bytesRead", "size of files read"):
                bytes_read = metric.value()
        out.append(ScanMetric(leaf.nodeName(), int(rows), int(bytes_read)))
    return out


def estimate_cost_usd(total_bytes: int, usd_per_tib: float = USD_PER_TIB) -> float:
    """The reference's cost model: bytes billed x $/TiB."""
    return (total_bytes / (1 << 40)) * usd_per_tib


def cost_report(df: DataFrame, threshold_usd: float = 0.50,
                execute: bool = False) -> dict:
    """O10 + the expensive-job alert shape: scan totals, estimated cost,
    and whether it crosses the reference's $0.50 alert threshold."""
    scans = scan_metrics(df, execute=execute)
    total_bytes = sum(s.bytes_read for s in scans)
    cost = estimate_cost_usd(total_bytes)
    return {
        "scans": [s.__dict__ for s in scans],
        "total_bytes": total_bytes,
        "estimated_usd": cost,
        "alert": cost > threshold_usd,
    }
