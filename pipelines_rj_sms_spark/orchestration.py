"""Optional Prefect shell around the ingestion jobs — the north star's
"Prefect orchestrating PySpark jobs" outer layer, kept deliberately thin.

The reference's whole outer shape is Prefect flows: each extract-load
pipeline is a flow of tasks with retries and per-table parameters
(reference: pipelines/flows.py:1-79, pipelines/utils/flow.py:62-93,
datalake/extract_load/*/flows.py). Here Spark owns ALL data movement —
the flow's only job is sequencing, retries, and surfacing reports, so
the shell is one module:

- ``ingest_flow(configs)``: a Prefect flow mapping ``run_ingestion``
  over IngestionConfig rows, one retried task per table.
- Import-gated like openpyxl: importing this module works without
  Prefect; building the flow raises NotImplementedError if Prefect is
  absent. A ``runner`` seam lets tests (and non-Prefect deployments)
  inject a stub executor.

Deliberate non-goals (SURVEY §7.2): Prefect deployments/schedules/
infra blocks — those are cluster-ops concerns, not engine semantics.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import SparkSession

from pipelines_rj_sms_spark.jobs import (
    IngestionConfig,
    IngestionReport,
    run_ingestion,
)


def _prefect():
    try:
        import prefect
    except ImportError as exc:  # pragma: no cover - depends on environment
        raise NotImplementedError(
            "the Prefect shell requires prefect (not installed in this "
            "container); use run_flow_inline or jobs.run_many instead"
        ) from exc
    return prefect


def run_flow_inline(
    spark: SparkSession,
    configs: Sequence[IngestionConfig],
    retries: int = 2,
    runner: Callable[[SparkSession, IngestionConfig], IngestionReport] = run_ingestion,
    on_report: Callable[[IngestionReport], None] | None = None,
) -> list[IngestionReport]:
    """The flow's semantics without Prefect: sequential map with
    ``retries`` re-attempts per config (the reference's
    `retry_delay=timedelta(...)`/max_retries task posture). A failed
    table never blocks the rest — its failure is carried as a report
    with a failed synthetic check, mirroring the reference's
    alert-then-continue handling for per-table errors.
    """
    from pipelines_rj_sms_spark.quality.checks import CheckResult

    reports: list[IngestionReport] = []
    for cfg in configs:
        last_exc: Exception | None = None
        for _attempt in range(retries + 1):
            try:
                rep = runner(spark, cfg)
                break
            except Exception as exc:  # noqa: BLE001 - retry boundary
                last_exc = exc
        else:
            rep = IngestionReport(
                cfg.name, 0, 0,
                [CheckResult("ingestion_error", False,
                             {"error": f"{type(last_exc).__name__}: {last_exc}"})])
        reports.append(rep)
        if on_report is not None:
            on_report(rep)
    return reports


def build_ingest_flow(
    retries: int = 2,
    retry_delay_seconds: int = 60,
) -> Any:
    """Build the Prefect flow object (requires prefect installed).

    One task per table with Prefect-native retries; the SparkSession is
    created inside the flow run (task results are small IngestionReport
    dataclasses — no DataFrame ever crosses the task boundary, so any
    Prefect result store works).
    """
    prefect = _prefect()

    @prefect.task(retries=retries, retry_delay_seconds=retry_delay_seconds)
    def _ingest_one(cfg: IngestionConfig) -> IngestionReport:
        from pipelines_rj_sms_spark.session import get_spark

        return run_ingestion(get_spark("prefect-ingest"), cfg)

    @prefect.flow(name="rj-sms-spark-ingest")
    def ingest_flow(configs: Sequence[IngestionConfig]) -> list[IngestionReport]:
        return [_ingest_one(cfg) for cfg in configs]

    return ingest_flow
