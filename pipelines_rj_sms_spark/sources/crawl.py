"""Bounded frontier crawl — the distributed form of the reference's
gazette tree-walk (S21: `diario_oficial_rj/tasks.py:24-204` walks
edition ids -> article ids -> article contents; utils 93-211).

That is a breadth-first crawl of constant depth, so the engine models it
exactly so: a driver loop over depth levels (bounded by ``max_depth`` —
a small constant, never data-dependent), where each level's frontier
fetches ON EXECUTORS via mapInPandas (one injected client per task) and
the next frontier is the fetched pages' out-links minus everything
already visited (left_anti on the url key — no driver-side visited set,
so the frontier can be millions of urls wide).

The ``fetcher(url) -> (content, [links])`` is injected like every other
fetch-stage client in this engine (api/scroll): tests use a fake graph,
production plugs an HTTP client.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("depth", IntegerType()),
    StructField("content", StringType()),
    StructField("links", StringType()),   # JSON array — exploded downstream
])


def _fetch_level(frontier: DataFrame,
                 fetcher: Callable[[str], tuple[str, list[str]]],
                 depth: int, max_retries: int) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url in pdf["url"]:
                content, links, err = "", [], None
                for _ in range(max_retries):
                    try:
                        content, links = fetcher(str(url))
                        err = None
                        break
                    except Exception as exc:  # noqa: BLE001 — retried
                        err = exc
                if err is not None:
                    content, links = f"__error__: {err}", []
                out.append((str(url), depth, content,
                            json.dumps(list(links))))
            if out:
                yield pd.DataFrame(out, columns=["url", "depth",
                                                 "content", "links"])

    return frontier.select("url").mapInPandas(run, PAGE_SCHEMA)


def crawl_scan(spark: SparkSession, seeds: list[str],
               fetcher: Callable[[str], tuple[str, list[str]]],
               max_depth: int = 2, max_retries: int = 3) -> DataFrame:
    """BFS crawl from ``seeds`` to ``max_depth`` levels; returns
    (url, depth, content) for every page fetched exactly once.

    Failed fetches (after retries) are recorded with an ``__error__``
    content marker rather than dropped — the gazette pipeline's
    load-what-parses posture; filter them out or alert on them
    downstream.

    Each level: fetch frontier (executors) -> persist -> next frontier =
    explode(out-links) minus visited (left_anti equi-join on url). The
    only driver-side state is the loop counter.
    """
    from pipelines_rj_sms_spark.operators.cache import track

    visited = spark.createDataFrame([(u,) for u in dict.fromkeys(seeds)],
                                    ["url"])
    frontier = visited
    pages: list[DataFrame] = []
    persisted: list[DataFrame] = []
    for depth in range(max_depth + 1):
        fetched = _fetch_level(frontier, fetcher, depth, max_retries)
        fetched = fetched.persist()
        persisted.append(fetched)
        pages.append(fetched.select("url", "depth", "content"))
        if depth == max_depth:
            break
        next_frontier = (
            fetched.select(F.explode(
                F.from_json("links", "array<string>")).alias("url"))
            .distinct()
            .join(visited, "url", "left_anti")
            .persist()
        )
        persisted.append(next_frontier)
        if next_frontier.isEmpty():
            break
        visited = visited.unionByName(next_frontier).persist()
        persisted.append(visited)
        frontier = next_frontier
    out = pages[0]
    for p in pages[1:]:
        out = out.unionByName(p)
    # callers release the per-level caches via cache.release(result)
    return track(out, *persisted)
