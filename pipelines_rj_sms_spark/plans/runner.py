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
    # dbt materialized='incremental' analog: when the target exists,
    # merge this run's rows into it by unique_key (keep-last on
    # order_col) instead of rebuilding — the run processes the
    # increment, not history. ts_col routes through the partition-scoped
    # lakehouse merge (touched date partitions only).
    incremental: bool = False
    unique_key: list[str] = field(default_factory=list)
    order_col: str | None = None
    ts_col: str | None = None


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

    # ---- dbt state:modified analog ---------------------------------
    # The reference round-trips dbt artifacts through GCS and passes
    # --state so CI builds only models whose compiled definition
    # changed (datalake/transform/dbt/tasks.py:346-390 + the --state
    # flag at :116-118). Here the manifest is a JSON snapshot of each
    # model's normalized definition; selection diffs the live DAG
    # against it.

    def manifest(self) -> dict[str, dict]:
        """Current-state manifest: a fingerprint per model covering
        everything dbt's state:modified considers — SQL (whitespace-
        normalized), deps, tags and materialization config."""
        import hashlib
        import json as _json

        out: dict[str, dict] = {}
        for name, m in self.models.items():
            norm_sql = " ".join(m.sql.split())
            payload = _json.dumps({
                "sql": norm_sql, "deps": sorted(m.deps),
                "tags": sorted(m.tags), "path": m.materialize_path,
                "incremental": m.incremental,
                "unique_key": sorted(m.unique_key),
                "order_col": m.order_col, "ts_col": m.ts_col,
            }, sort_keys=True)
            out[name] = {"fingerprint":
                         hashlib.md5(payload.encode()).hexdigest()}
        return out

    def write_state(self, state_path: str, store=None) -> None:
        """Persist the manifest (dbt's upload-artifacts step; call
        after a successful build so the next CI run diffs against it).

        With ``store`` (a `plans.artifacts.ObjectStore`), the manifest
        is PUT under key ``state_path`` instead of the local
        filesystem — the reference's artifact-upload leg
        (datalake/transform/dbt/tasks.py:346-390), so two runner
        instances on different machines share state through the same
        bucket."""
        import json as _json

        payload = _json.dumps(self.manifest(), indent=1, sort_keys=True)
        if store is not None:
            store.put(state_path, payload.encode("utf-8"))
            return
        with open(state_path, "w", encoding="utf-8") as f:
            f.write(payload)

    def select_state_modified(self, state_path: str,
                              with_downstream: bool = True,
                              store=None) -> set[str]:
        """Models whose fingerprint differs from the stored state
        (edited SQL, changed deps/config, or brand new), plus —
        by default, dbt's `state:modified+` — their transitive
        dependents. Upstream deps are NOT pulled in: unchanged parents
        already exist from the previous build, which is the entire
        point of state selection. ``store`` reads the manifest from an
        ObjectStore key instead of the local filesystem (the
        artifact-download leg); a missing key selects everything —
        first deploy builds the world, same as dbt without --state."""
        import json as _json

        if store is not None:
            if not store.exists(state_path):
                return set(self.models)
            stored = _json.loads(store.get(state_path).decode("utf-8"))
        else:
            with open(state_path, encoding="utf-8") as f:
                stored = _json.load(f)
        live = self.manifest()
        base = {n for n, fp in live.items()
                if n not in stored
                or stored[n]["fingerprint"] != fp["fingerprint"]}
        if with_downstream:
            changed = True
            while changed:
                changed = False
                for n, m in self.models.items():
                    if n not in base and any(d in base for d in m.deps):
                        base.add(n)
                        changed = True
        return base

    def run_state_modified(self, state_path: str,
                           with_downstream: bool = True,
                           store=None) -> list[ModelResult]:
        """Build only what changed since ``state_path`` (+downstream).
        Unchanged upstreams must already be registered/materialized
        from the prior build — same contract as dbt --state."""
        selected = self.select_state_modified(state_path,
                                              with_downstream,
                                              store=store)
        return self._run_selected(selected)

    def run(self, tag: str | None = None,
            with_downstream: bool = False) -> list[ModelResult]:
        selected = self.select(tag, with_downstream)
        return self._run_selected(selected)

    def _run_selected(self, selected: set[str]) -> list[ModelResult]:
        results: list[ModelResult] = []
        for model in self._toposort(selected):
            t0 = time.monotonic()
            df: DataFrame = self.spark.sql(model.sql)
            if model.materialize_path:
                df = self._materialize(model, df)
            df.createOrReplaceTempView(model.name)
            rows = df.count()
            results.append(ModelResult(model.name, rows, time.monotonic() - t0))
        return results

    def _materialize(self, model: Model, df: DataFrame) -> DataFrame:
        import os

        path = model.materialize_path
        if model.incremental and os.path.isdir(path):
            if not model.unique_key or model.order_col is None:
                raise ValueError(
                    f"incremental model {model.name} needs unique_key "
                    "and order_col")
            if model.ts_col is not None:
                # date-partitioned target: partition-scoped merge — the
                # run's cost tracks touched partitions, not history
                from pipelines_rj_sms_spark.sinks.lakehouse import (
                    merge_upsert)
                merge_upsert(self.spark, path, df, model.unique_key,
                             model.order_col, ts_col=model.ts_col)
            else:
                # unpartitioned target: full merge via staging swap
                # (never overwrite a path while reading it). Local-FS
                # rename; on an object store use the partitioned path
                # or a table format.
                import shutil

                from pipelines_rj_sms_spark.operators.dedup import (
                    dedup_keep_last)
                existing = self.spark.read.parquet(path)
                # keep-last per key; order-value ties resolve via
                # dedup_keep_last's deterministic remaining-column
                # tiebreak (same winner on any cluster/partitioning)
                merged = dedup_keep_last(
                    df.unionByName(existing),
                    keys=model.unique_key, order_col=model.order_col)
                staging = f"{path}__staging"
                merged.write.mode("overwrite").parquet(staging)
                shutil.rmtree(path)
                os.rename(staging, path)
        else:
            df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)
