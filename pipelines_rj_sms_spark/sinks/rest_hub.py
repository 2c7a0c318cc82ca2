"""REST record sink — the reference's "data hub" JSON POST loader (K7).

Reference: pipelines/utils/datalake_hub.py:48-77 POSTs `{"records": [...]}`
batches. Spark-side this is a foreachPartition sink: each executor task
serializes its partition to JSON dicts and POSTs in bounded batches with
retry — connection setup amortizes per partition, the driver never
materializes the data.

The HTTP transport is injected (``poster``) so tests run a collecting
fake and production plugs `requests`. Retries are per-batch with
exponential backoff, mirroring the reference's transient-retry posture
(bq_to_subpav/utils.py:62-122).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row

Poster = Callable[[str, list[dict]], None]


def _requests_poster(timeout_s: int = 90) -> Poster:
    def post(url: str, records: list[dict]) -> None:
        import requests

        resp = requests.post(url, json={"records": records}, timeout=timeout_s)
        resp.raise_for_status()

    return post


def write_records_http(df: DataFrame, url: str, batch_size: int = 500,
                       max_retries: int = 3, backoff_s: float = 1.0,
                       poster: Poster | None = None) -> None:
    """K7: POST the DataFrame as JSON record batches, partition-parallel.

    Executes eagerly (an action). Idempotency is the endpoint's concern,
    as in the reference; batches retry up to ``max_retries`` with
    exponential backoff before failing the task (Spark then retries the
    task — at-least-once semantics).
    """
    post = poster or _requests_poster()

    def handle_partition(rows: Iterator[Row]) -> None:
        batch: list[dict] = []

        def flush() -> None:
            if not batch:
                return
            for attempt in range(max_retries):
                try:
                    post(url, batch)
                    break
                except Exception:  # noqa: BLE001 — transient-retry semantics
                    if attempt == max_retries - 1:
                        raise
                    time.sleep(backoff_s * (2 ** attempt))
            batch.clear()

        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                flush()
        flush()

    df.foreachPartition(handle_partition)
