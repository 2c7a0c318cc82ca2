"""API-ingestion scaffolding: window fan-out + distributed fetch (S14-S16).

The reference fans a day into 24x1h windows (vitai_api/tasks.py:47-113) or
2h windows (cientificalab_api/tasks.py:203-248) and fetches per window.
Spark-side: the window table is sequence+explode (functions.dates), and
the fetch runs on executors via mapInPandas with one HTTP session per
partition — never a driver loop.

`requests` may be absent; the fetch function is injected so tests use a
fake fetcher and production plugs a real HTTP client.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

RESPONSE_SCHEMA = StructType([
    StructField("window_start", StringType()),
    StructField("window_end", StringType()),
    StructField("payload", StringType()),   # raw JSON blob, parsed downstream
    StructField("status", StringType()),
])


def fetch_windows(windows: DataFrame,
                  fetcher: Callable[[str, str], dict],
                  max_retries: int = 3) -> DataFrame:
    """Run ``fetcher(window_start, window_end) -> dict`` per window row on
    executors, returning raw JSON payloads (the raw-zone contract, C13).

    One fetcher call per row, but connection setup amortizes per Arrow
    batch; retries happen inline with bounded attempts (the reference's
    @task(max_retries) collapsed into the operator).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                ws = str(row["window_start"])
                we = str(row["window_end"])
                payload, status = None, "error"
                for _ in range(max_retries):
                    try:
                        payload = json.dumps(fetcher(ws, we))
                        status = "ok"
                        break
                    except Exception as exc:  # noqa: BLE001 — retried, then recorded
                        payload = json.dumps({"error": str(exc)})
                out.append((ws, we, payload, status))
            yield pd.DataFrame(out, columns=["window_start", "window_end",
                                             "payload", "status"])

    return windows.mapInPandas(run, RESPONSE_SCHEMA)
