"""Snapshot-versioned tables: manifest-based time travel over Parquet
(an Iceberg-lite, public-concept design — no table-format jars).

`sinks/lakehouse.py` gives the reference's create/append/overwrite
semantics; what it cannot answer is "what did this table contain
YESTERDAY" or "undo that bad backfill". This module adds exactly that
with the standard log-of-manifests construction:

    table/
      data/commit-00003-<uuid>/part-*.parquet   (immutable, per-commit)
      _versions/v00001.json ... v00003.json     (the commit log)

- Every write lands its files in a fresh ``data/commit-*`` directory
  (Spark's native parquet writer, full parallelism), then publishes ONE
  small JSON manifest listing the table's complete file set for the new
  version. Readers never list data directories — they read the manifest
  and load exactly those files, so a half-written commit is invisible
  (the manifest is published last, atomically via rename).
- ``append`` manifests = parent files + new files; ``overwrite``
  manifests = new files only. ``rollback`` publishes a new version that
  POINTS AT an old file set — non-destructive, auditable undo.
- Optimistic concurrency: the manifest rename is create-exclusive; two
  racing writers produce one winner and one clean
  ``SnapshotConflictError`` (retry = re-read latest, re-commit).
- ``expire_snapshots`` is the vacuum: drops manifests older than the
  retention horizon and deletes commit directories no LIVE manifest
  references.

Scale notes: manifests carry file paths, not rows — commit cost is one
file listing of the just-written directory plus one small JSON write,
independent of table size. Reads pass the explicit file list to the
parquet source (footer pruning, predicate pushdown, and column pruning
all still apply); Hive-style partition-directory discovery does not —
snapshot tables encode partition values in columns, the normal
table-format posture. Local filesystem rename is atomic; on object
stores, swap the publish step for a conditional PUT — the layout needs
no change.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflictError(RuntimeError):
    """Another writer published this version first — re-read and
    retry."""


def _versions_dir(path: str) -> str:
    return os.path.join(path, "_versions")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_versions_dir(path), f"v{version:05d}.json")


def _list_versions(path: str) -> list[int]:
    vd = _versions_dir(path)
    if not os.path.isdir(vd):
        return []
    return sorted(int(os.path.basename(p)[1:-5])
                  for p in glob.glob(os.path.join(vd, "v*.json")))


def latest_version(path: str) -> int | None:
    vs = _list_versions(path)
    return vs[-1] if vs else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version), encoding="utf-8") as f:
        return json.load(f)


def _publish(path: str, manifest: dict) -> None:
    """Atomically publish a manifest: write to a temp name, then
    hard-link/rename with create-exclusive semantics so a racing
    writer of the same version loses cleanly."""
    os.makedirs(_versions_dir(path), exist_ok=True)
    target = _manifest_path(path, manifest["version"])
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    try:
        os.link(tmp, target)  # fails with EEXIST if someone won
    except FileExistsError as exc:
        os.remove(tmp)
        raise SnapshotConflictError(
            f"version {manifest['version']} already published") from exc
    os.remove(tmp)


def snapshot_write(df: DataFrame, path: str, mode: str = "append",
                   action: str | None = None,
                   base_files: list[str] | None = None) -> int:
    """Commit ``df`` as a new table version; returns the version
    number. mode='append' keeps the parent's files, 'overwrite'
    replaces the file set. ``base_files``/``action`` are internal
    hooks for rollback-style commits."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent = latest_version(path)
    version = (parent or 0) + 1
    new_files: list[str] = []
    if df is not None:
        commit_dir = f"commit-{version:05d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(path, "data", commit_dir)
        df.write.mode("error").parquet(out)
        new_files = sorted(
            os.path.join("data", commit_dir, os.path.basename(p))
            for p in glob.glob(os.path.join(out, "part-*.parquet")))
    files = list(base_files or [])
    if mode == "append" and base_files is None and parent is not None:
        files = _read_manifest(path, parent)["files"]
    files = files + new_files
    manifest = {
        "version": version,
        "parent": parent,
        "action": action or mode,
        "files": files,
        "schema": df.schema.simpleString() if df is not None else
        _read_manifest(path, parent)["schema"],
    }
    _publish(path, manifest)
    return version


def snapshot_read(spark: SparkSession, path: str,
                  version: int | None = None) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest). An empty
    file set returns an empty DataFrame with the recorded schema."""
    v = version if version is not None else latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    man = _read_manifest(path, v)
    files = [os.path.join(path, f) for f in man["files"]]
    if not files:
        return spark.createDataFrame([], man["schema"])
    return spark.read.parquet(*files)


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """The commit log as a DataFrame: (version, parent, action,
    n_files) — the audit surface."""
    rows = []
    for v in _list_versions(path):
        m = _read_manifest(path, v)
        rows.append((m["version"], m.get("parent"), m["action"],
                     len(m["files"])))
    return spark.createDataFrame(
        rows, "version int, parent int, action string, n_files int")


def snapshot_rollback(path: str, to_version: int) -> int:
    """Publish a NEW version whose file set is ``to_version``'s — the
    non-destructive undo (history keeps both the mistake and the
    revert)."""
    man = _read_manifest(path, to_version)
    parent = latest_version(path)
    version = (parent or 0) + 1
    _publish(path, {
        "version": version, "parent": parent,
        "action": f"rollback:{to_version}",
        "files": man["files"], "schema": man["schema"],
    })
    return version


def expire_snapshots(path: str, keep_last: int) -> dict:
    """Vacuum: keep the last ``keep_last`` manifests, drop older ones,
    and delete commit directories referenced by NO surviving manifest.
    Returns {"dropped_versions": [...], "deleted_dirs": [...]}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _list_versions(path)
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    live: set[str] = set()
    for v in keep:
        for f in _read_manifest(path, v)["files"]:
            live.add(f.split(os.sep)[1])  # data/<commit-dir>/part...
    for v in drop:
        os.remove(_manifest_path(path, v))
    deleted = []
    data_dir = os.path.join(path, "data")
    if os.path.isdir(data_dir):
        for d in sorted(os.listdir(data_dir)):
            if d not in live:
                shutil.rmtree(os.path.join(data_dir, d))
                deleted.append(d)
    return {"dropped_versions": drop, "deleted_dirs": deleted}
