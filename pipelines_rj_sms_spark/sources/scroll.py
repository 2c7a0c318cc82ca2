"""Document-store scans: key-sliced cursors and scroll pagination (S6/S7).

S6 — MongoDB sliced scan (reference
`minhasaude_mongodb/tasks.py:161-256`): min/max of the slice key become
N contiguous ranges (`gerar_faixas_de_fatiamento`), each range is
fetched as its own cursor (`extrair_fatia_para_datalake`), flushing
every 10k docs. Spark-side the slice table is `sequence`+`explode`
(driver holds only the two boundary scalars), and each slice's fetch
runs on an executor via mapInPandas — the 10k flush is Arrow batching.

S7 — Elasticsearch scroll scan (reference
`sisreg_api/tasks.py:174-232`): a bool+range query paged by scroll
cursor with shard-failure checks and a ±5% count reconciliation. The
Spark analog is ES's own sliced-scroll protocol: `num_slices` parallel
scroll streams, one per task, each looping its cursor to exhaustion on
the executor. The count reconcile reuses quality.reconcile_counts (Q1).

Both readers take an injectable ``fetcher`` so tests run a fake client
and production plugs pymongo/elasticsearch (absent in this container).
Payloads come back as raw JSON strings — the raw-zone contract shared
with sources.api — and are parsed downstream with from_json/VARIANT.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

DOC_SCHEMA = StructType([
    StructField("slice_id", LongType()),
    StructField("doc", StringType()),
])


def plan_slices(spark: SparkSession, lo: int, hi: int,
                slice_size: int) -> DataFrame:
    """S6 slice planning: [lo, hi] -> rows (slice_id, lo, hi) of width
    ``slice_size`` (inclusive bounds, like the reference's $gte/$lte
    ranges). Pure `sequence`+`explode` — no driver-side range list, so a
    10^9-key collection plans in one expression.
    """
    if hi < lo:
        raise ValueError(f"empty key range [{lo}, {hi}]")
    if slice_size <= 0:
        raise ValueError("slice_size must be positive")
    return (
        spark.range(1)
        .select(F.explode(
            F.sequence(F.lit(lo), F.lit(hi), F.lit(slice_size))).alias("lo"))
        .select(
            ((F.col("lo") - F.lit(lo)) / F.lit(slice_size))
            .cast("long").alias("slice_id"),
            F.col("lo"),
            F.least(F.col("lo") + F.lit(slice_size - 1),
                    F.lit(hi)).alias("hi"),
        )
    )


def plan_slices_by_cap(spark: SparkSession, lo: int, hi: int,
                       total: int, cap: int) -> DataFrame:
    """S20 slice planning (reference `ser_metabase/tasks.py:24-222`):
    the source reports ``total`` rows and truncates responses at ``cap``,
    so the key range is cut into ceil(total/cap) even slices — each
    expected to stay under the cap if keys are roughly uniform. Pair
    with ``sliced_scan(..., cap=cap)`` to fail loudly when they aren't.
    """
    if total <= 0:
        raise ValueError("total must be positive")
    n = -(-total // cap)
    width = max(1, -(-(hi - lo + 1) // n))
    return plan_slices(spark, lo, hi, width)


def sliced_scan(slices: DataFrame,
                fetcher: Callable[[int, int], list[dict]],
                max_retries: int = 3, cap: int | None = None) -> DataFrame:
    """S6 fetch stage: run ``fetcher(lo, hi) -> list[dict]`` per slice on
    executors; one output row per document, JSON-encoded. Slices are
    repartitioned to one-per-task so a slow shard doesn't serialize the
    scan behind its neighbors in the same partition.

    ``cap``: sources that silently truncate responses (S20's 1M-row
    Metabase limit, Q4 posture) — a slice coming back with >= cap docs
    is indistinguishable from a truncated one, so raise instead of
    loading silently-short data.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                sid = int(row["slice_id"])
                docs, err = [], None
                for _ in range(max_retries):
                    try:
                        docs = fetcher(int(row["lo"]), int(row["hi"]))
                        err = None
                        break
                    except Exception as exc:  # noqa: BLE001 — retried below
                        err = exc
                if err is not None:
                    raise RuntimeError(
                        f"slice {sid} failed after {max_retries} tries"
                    ) from err
                if cap is not None and len(docs) >= cap:
                    raise RuntimeError(
                        f"slice {sid} returned {len(docs)} docs at the "
                        f"source cap {cap} — response likely truncated; "
                        "re-plan with narrower slices")
                if docs:
                    yield pd.DataFrame(
                        {"slice_id": sid,
                         "doc": [json.dumps(d, sort_keys=True)
                                 for d in docs]})

    n = max(slices.count(), 1)
    return slices.repartition(n, "slice_id").mapInPandas(run, DOC_SCHEMA)


def scroll_scan(spark: SparkSession, num_slices: int,
                fetcher: Callable[[int, int, str | None],
                                  tuple[list[dict], str | None]],
                max_pages: int = 100_000) -> DataFrame:
    """S7: ``num_slices`` parallel scroll streams. Each task loops
    ``fetcher(slice_id, num_slices, cursor)`` until the returned cursor
    is None, yielding one Arrow batch per page (documents stream through
    the task — never accumulated). ``max_pages`` bounds a cursor that
    never terminates (the reference's shard-failure posture: fail loud,
    not silently short).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                sid = int(row["id"])
                cursor: str | None = None
                for _ in range(max_pages):
                    docs, cursor = fetcher(sid, num_slices, cursor)
                    if docs:
                        yield pd.DataFrame(
                            {"slice_id": sid,
                             "doc": [json.dumps(d, sort_keys=True)
                                     for d in docs]})
                    if cursor is None:
                        break
                else:
                    raise RuntimeError(
                        f"scroll slice {sid} still open after "
                        f"{max_pages} pages")

    slices = spark.range(num_slices).repartition(num_slices, "id")
    return slices.mapInPandas(run, DOC_SCHEMA)
