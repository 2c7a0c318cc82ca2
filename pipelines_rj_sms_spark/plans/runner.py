"""Model runner — the dbt-on-BigQuery analog (SURVEY §3.3) over spark.sql.

The reference delegates its transform DAG to dbt (datalake/transform/dbt/
tasks.py:72-148) with tag selection and state. Here a model is a named
SQL string (or a function returning a DataFrame); the runner topologically
sorts models by declared deps, optionally filters by tag (+downstream),
runs each via spark.sql, registers the result as a temp view (or writes
it), and reports per-model metrics (rows, wall seconds — the Spark analog
of the reference's bytes-billed cost report, O10).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    name: str
    sql: str
    deps: list[str] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)
    materialize_path: str | None = None   # None -> temp view only


@dataclass
class ModelResult:
    name: str
    rows: int
    seconds: float


class ModelRunner:
    def __init__(self, spark: SparkSession, models: list[Model]):
        self.spark = spark
        self.models = {m.name: m for m in models}
        if len(self.models) != len(models):
            raise ValueError("duplicate model names")
        for m in models:
            for d in m.deps:
                if d not in self.models:
                    raise ValueError(f"model {m.name} depends on unknown {d}")

    def _toposort(self, selected: set[str]) -> list[Model]:
        order: list[Model] = []
        done: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str) -> None:
            if name in done:
                return
            if name in visiting:
                raise ValueError(f"dependency cycle at {name}")
            visiting.add(name)
            for d in self.models[name].deps:
                visit(d)
            visiting.discard(name)
            done.add(name)
            if name in selected:
                order.append(self.models[name])

        for name in sorted(selected):
            visit(name)
        return order

    def select(self, tag: str | None = None,
               with_downstream: bool = False) -> set[str]:
        """dbt-ish selection: by tag, optionally plus transitive dependents.
        Selected models always pull their upstream deps in (dbt `+model`)."""
        if tag is None:
            base = set(self.models)
        else:
            base = {n for n, m in self.models.items() if tag in m.tags}
        if with_downstream:
            changed = True
            while changed:
                changed = False
                for n, m in self.models.items():
                    if n not in base and any(d in base for d in m.deps):
                        base.add(n)
                        changed = True
        # pull upstream deps transitively (a model can't run without them)
        stack = list(base)
        while stack:
            for d in self.models[stack.pop()].deps:
                if d not in base:
                    base.add(d)
                    stack.append(d)
        return base

    def run(self, tag: str | None = None,
            with_downstream: bool = False) -> list[ModelResult]:
        selected = self.select(tag, with_downstream)
        results: list[ModelResult] = []
        for model in self._toposort(selected):
            t0 = time.monotonic()
            df: DataFrame = self.spark.sql(model.sql)
            if model.materialize_path:
                df.write.mode("overwrite").parquet(model.materialize_path)
                df = self.spark.read.parquet(model.materialize_path)
            df.createOrReplaceTempView(model.name)
            rows = df.count()
            results.append(ModelResult(model.name, rows, time.monotonic() - t0))
        return results
