"""Row-enrichment operators with external side effects (C21/C22).

- enrich_http: the per-row geocoding pattern (coordenadas_
  estabelecimentos_pgeo3/tasks.py:44-140) as mapInPandas with one client
  per partition — connection reuse, bounded retries, never a driver loop.
- llm_enrich: the Gemini classification pattern (transform/gemini/
  pacientes_restritos/tasks.py:44-131) as an *iterator* pandas UDF:
  the model client initializes once per executor python worker, prompts
  go out in micro-batches with a rate limit, responses are regex-parsed
  into a structured column downstream (jsonops / regexp_extract).

Both take injectable callables: tests plug fakes; production plugs
`requests` / an LLM SDK. The operators own batching, retry, and error
capture (a failed row becomes status='error', it never kills the job —
the reference's alert-don't-crash posture).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def enrich_http(df: DataFrame, key_col: str, request_col: str,
                fetcher: Callable[[str], dict],
                max_retries: int = 3) -> DataFrame:
    """C21: fetcher(request_value) -> dict per row, executor-side.

    Output: (key, payload JSON string, status). The fetcher is created
    once per partition iterator — session/connection reuse comes free.
    """
    schema = StructType([
        StructField("key", StringType()),
        StructField("payload", StringType()),
        StructField("status", StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                key, req = str(row[key_col]), str(row[request_col])
                payload, status = None, "error"
                for _ in range(max_retries):
                    try:
                        payload = json.dumps(fetcher(req))
                        status = "ok"
                        break
                    except Exception as exc:  # noqa: BLE001 — recorded per row
                        payload = json.dumps({"error": str(exc)})
                out.append((key, payload, status))
            yield pd.DataFrame(out, columns=["key", "payload", "status"])

    return df.select(key_col, request_col).mapInPandas(run, schema)


def llm_enrich_udf(model_fn: Callable[[list[str]], list[str]],
                   batch_size: int = 16,
                   min_interval_s: float = 0.0):
    """C22: iterator pandas UDF factory — prompt column -> response column.

    ``model_fn(prompts) -> responses`` is called on micro-batches of at
    most ``batch_size`` with ``min_interval_s`` between calls (rate
    limit). Iterator form means any per-worker client setup inside
    ``model_fn``'s closure happens once per python worker, not per batch.
    Errors are captured per batch as '{"error": ...}' strings so one bad
    call doesn't fail the stage.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _enrich(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        last_call = 0.0
        for prompts in it:
            vals = prompts.tolist()
            out: list[str] = []
            for i in range(0, len(vals), batch_size):
                chunk = vals[i:i + batch_size]
                wait = min_interval_s - (time.monotonic() - last_call)
                if wait > 0:
                    time.sleep(wait)
                last_call = time.monotonic()
                try:
                    res = model_fn(chunk)
                    if len(res) != len(chunk):
                        raise ValueError(
                            f"model returned {len(res)} results for {len(chunk)} prompts")
                    out.extend(res)
                except Exception as exc:  # noqa: BLE001 — captured per batch
                    out.extend(json.dumps({"error": str(exc)}) for _ in chunk)
            yield pd.Series(out, index=prompts.index)

    return _enrich
