"""Python DataSource API (Spark 4) — engine formats as first-class
``spark.read.format(...)`` sources.

`sources/formats.read_dbf` already distributes DBF decoding via
binaryFile + mapInPandas; this module exposes the same decoder through
the idiomatic extension point so a user writes

    spark.dataSource.register(DbfDataSource)
    spark.read.format("dbf").option("encoding", "latin-1").load(glob)

and gets real partition planning: one InputPartition per file, decode
on executors, Arrow RecordBatch output (vectorized transfer, no
row-at-a-time Python<->JVM chatter). Registration is once per session;
the format then composes with every downstream DataFrame op like any
built-in source.

Scale notes:
- Partition granularity is per file — the DATASUS corpus shape
  (thousands of single-digit-MB monthly files) spreads across the
  cluster; there is no driver-side decode.
- The reader opens files with local ``open()``: correct for the
  NFS/local-mount layout this engine tests against. For object-store
  deployments the binaryFile-based ``read_dbf`` path (same parser) is
  the route, since it rides Hadoop's filesystem connectors.
- Schema comes from one header read on the driver (DBF is
  footer-free: only the first KB is touched).

Only formats whose decode genuinely needs Python get a Python source:
DBF qualifies (binary layout Spark has no reader for). Text formats
the engine already parses JVM-side (SQL dumps via regexp+from_csv,
fixed-width via substring) stay on the built-in text source — wrapping
those here would move a codegen'd parse into Python for API symmetry,
which is the wrong trade.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _resolve_paths(options) -> list[str]:
    path = options.get("path")
    if not path:
        raise ValueError("path is required (pass via .load(path))")
    paths = sorted(_glob.glob(path.removeprefix("file://")))
    if not paths:
        raise FileNotFoundError(f"no files match {path}")
    return paths


class DbfDataSource(DataSource):
    """dBase III files as a Spark batch source (all-string posture).

    Reference semantics: datalake/utils/data_transformations.py:121-129
    (pyreaddbc/simpledbf decode to pandas); here the decode is the
    repo's own pure-Python dBase parser running on executors.
    """

    @classmethod
    def name(cls) -> str:
        return "dbf"

    def schema(self) -> StructType:
        from pipelines_rj_sms_spark.sources.formats import dbf_schema

        first = _resolve_paths(self.options)[0]
        return dbf_schema(first, self.options.get("encoding", "latin-1"))

    def reader(self, schema: StructType) -> DataSourceReader:
        return _DbfReader(schema, dict(self.options))


class _DbfReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._options = options
        self._paths = _resolve_paths(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa

        from pipelines_rj_sms_spark.sources.formats import _parse_dbf_bytes

        encoding = self._options.get("encoding", "latin-1")
        names = self._schema.fieldNames()[:-1]  # last field = _source_file
        with open(partition.path, "rb") as f:
            cols, rows = _parse_dbf_bytes(f.read(), encoding)
        aligned = {n: [] for n in names}
        for row in rows:
            rec = dict(zip(cols, row))
            for n in names:
                aligned[n].append(rec.get(n, ""))
        arrays = [pa.array(aligned[n], pa.string()) for n in names]
        arrays.append(pa.array([partition.path] * len(rows), pa.string()))
        yield pa.RecordBatch.from_arrays(
            arrays, names=self._schema.fieldNames())


def register_all(spark) -> None:
    """Register every engine Python data source on the session."""
    spark.dataSource.register(DbfDataSource)
