"""Artifact store for cross-run model state — the object-store leg of
the dbt state workflow.

The reference uploads dbt artifacts (manifest.json & friends) to an
object store after a successful build and downloads them before the
next CI run so `--state` can diff against the previous deployment
(`datalake/transform/dbt/tasks.py:346-390`). The engine half of that
workflow (fingerprint manifests + `state:modified+` selection) lives in
`plans/runner.py`; this module supplies the STORE half as a minimal
key→bytes protocol, so the runner round-trips state through any object
store without knowing which one.

Implementations:

- ``LocalFileStore`` — keys are paths under a root directory; the
  single-machine / NFS / FUSE-mounted-bucket case.
- ``MemoryStore`` — a dict; the unit-test double standing in for a
  remote object store client (S3/GCS/ABFS all reduce to the same three
  calls — swap in a client-backed implementation with ~10 lines).

Both are deliberately tiny: state manifests are a few KB of JSON, so
there is no need for streaming, multipart, or listing semantics here.
"""

from __future__ import annotations

import os
from typing import Protocol, runtime_checkable


@runtime_checkable
class ObjectStore(Protocol):
    """Minimal key->bytes store: what dbt's artifact up/download needs."""

    def put(self, key: str, data: bytes) -> None: ...

    def get(self, key: str) -> bytes: ...

    def exists(self, key: str) -> bool: ...


class LocalFileStore:
    """Keys as relative paths under ``root`` (created on demand).
    Writes are atomic (temp file + rename) so a concurrent reader
    never sees a half-written manifest — the same publish discipline
    as the lakehouse sinks."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: str) -> str:
        p = os.path.join(self.root, key)
        if os.path.commonpath([os.path.abspath(p),
                               os.path.abspath(self.root)]) \
                != os.path.abspath(self.root):
            raise ValueError(f"key escapes store root: {key}")
        return p

    def put(self, key: str, data: bytes) -> None:
        p = self._path(key)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def exists(self, key: str) -> bool:
        return os.path.isfile(self._path(key))


class MemoryStore:
    """In-memory ObjectStore — the test double for a remote bucket."""

    def __init__(self):
        self._d: dict[str, bytes] = {}

    def put(self, key: str, data: bytes) -> None:
        self._d[key] = bytes(data)

    def get(self, key: str) -> bytes:
        return self._d[key]

    def exists(self, key: str) -> bool:
        return key in self._d
