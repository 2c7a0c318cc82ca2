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

The module also ships a streaming source: ``ReplayDataSource``
(format "replay") turns any static parquet dataset into a
deterministic, offset-tracked, rate-controlled stream — the simulator
the streaming operators' batch/stream parity tests run against; and a
WRITER: ``JsonlCommitDataSource`` (format "jsonlcommit"), a JSONL sink
with the full two-phase commit protocol (task staging -> driver
publish + _SUCCESS manifest, abort cleanup) — all three legs of the
Spark-4 Python DataSource surface exercised.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
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


# ------------------------------------------------------------ replay stream

class ReplayDataSource(DataSource):
    """Deterministic replay of a static parquet dataset as a stream.

    ``spark.readStream.format("replay").option("rowsPerBatch", N)
    .load(path_glob)`` emits the dataset in stable (file, row) order, N
    rows per microbatch, with real offset tracking — a checkpointed
    query restarts exactly where it stopped, with no duplicate or lost
    rows. This is the stream simulator the engine's streaming operators
    are tested against (batch/stream parity), replacing ad-hoc file
    drops with a reproducible, rate-controlled feed.

    Design notes:
    - Offsets are global row positions over the sorted file list;
      planning touches only parquet footers (row counts + row-group
      boundaries).
    - Built on ``SimpleDataSourceStreamReader`` deliberately: a paced
      full ``DataSourceStreamReader`` must keep its own
      latest-planned-offset counter, which restarts at zero on
      recovery and can disagree with the restored checkpoint — the
      Simple contract derives every batch from the engine-supplied
      start offset and replays ranges via ``readBetweenOffsets``, so
      exactly-once holds by construction. The trade-off (batches flow
      through the driver) is the right one for a test/replay feed;
      bulk production ingestion belongs on the native file source.
    - Reads are row-group pruned: a batch materializes only the row
      groups overlapping its offset range, then trims — never whole
      files.
    """

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self) -> StructType:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        first = _resolve_paths(self.options)[0]
        return from_arrow_schema(pq.read_schema(first),
                                 prefer_timestamp_ntz=True)

    def simpleStreamReader(self, schema: StructType):
        return _ReplayStreamReader(dict(self.options))


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        import pyarrow.parquet as pq

        self._rows_per_batch = int(options.get("rowsperbatch", 1000))
        # footer-only catalog: (path, cumulative start row, per-row-group counts)
        self._files: list[tuple[str, int, list[int]]] = []
        total = 0
        for path in _resolve_paths(options):
            meta = pq.ParquetFile(path).metadata
            rg = [meta.row_group(i).num_rows
                  for i in range(meta.num_row_groups)]
            self._files.append((path, total, rg))
            total += sum(rg)
        self._total = total

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self._rows_per_batch, self._total)
        if hi <= lo:
            return iter([]), start
        # a list iterator, not a generator: Spark's prefetch cache
        # drains it with next() and pickles the batch to ship it to
        # executors (generators can't pickle); size is bounded by
        # rowsPerBatch
        return iter(list(self._rows(lo, hi))), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure-recovery replay: same range -> same rows, always
        return iter(list(self._rows(start["row"], end["row"])))

    def _rows(self, lo: int, hi: int):
        import pyarrow.parquet as pq

        for path, file_start, rgs in self._files:
            if file_start + sum(rgs) <= lo or file_start >= hi:
                continue
            rg_start = file_start
            picked: list[int] = []
            first_rg_start: int | None = None
            for i, n in enumerate(rgs):
                rg_end = rg_start + n
                if rg_end > lo and rg_start < hi:
                    if first_rg_start is None:
                        first_rg_start = rg_start
                    picked.append(i)
                rg_start = rg_end
            if not picked:
                continue
            table = pq.ParquetFile(path).read_row_groups(picked)
            skip = max(0, lo - first_rg_start)
            take = min(hi, file_start + sum(rgs)) - max(lo, first_rg_start)
            sliced = table.slice(skip, take)
            for batch in sliced.to_batches():
                yield from zip(*[c.to_pylist() for c in batch.columns])

    def commit(self, end: dict) -> None:
        pass


class AvroDataSource(DataSource):
    """Avro Object Container Files as a Spark batch source via the
    repo's pure-Python codec (`sources/avroc.py` — public format
    spec, null + deflate codecs, no spark-avro package needed).

    Registered as "pyavro" (NOT "avro") so the built-in spark-avro
    resolution path stays unshadowed where that package exists.
    Partitioning is per file — the BigQuery-extract shard shape; the
    driver reads only the first file's header for the schema. Rows are
    yielded as Python tuples against the inferred Spark schema (Avro
    nullable-union/array/map/nested-record types map directly);
    per-file Arrow batch assembly is a possible optimization, not a
    semantic change.
    """

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self) -> StructType:
        from pipelines_rj_sms_spark.sources.avroc import (
            read_header, schema_to_spark)

        first = _resolve_paths(self.options)[0]
        with open(first, "rb") as f:
            avro_schema, _, _ = read_header(f)
        spark_type = schema_to_spark(avro_schema)
        if not isinstance(spark_type, StructType):
            raise ValueError("top-level avro schema must be a record")
        return spark_type

    def reader(self, schema: StructType) -> DataSourceReader:
        return _AvroReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("pyavro write requires a save path")
        codec = self.options.get("codec", "deflate")
        return _AvroCommitWriter(path, schema, overwrite, codec)


class _AvroReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._paths = _resolve_paths(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition) -> Iterator:
        from pipelines_rj_sms_spark.sources.avroc import read_container

        with open(partition.path, "rb") as f:
            _, records = read_container(f.read())
        yield from records


class _AvroCommitWriter(DataSourceWriter):
    """Write-side of the "pyavro" format: every task encodes its
    partition into ONE container file (deflate by default) under a
    hidden staging dir; only the driver's commit() renames the task
    files into place — the same two-phase protocol as the JSONL sink,
    so task retries/speculation never publish duplicates."""

    def __init__(self, path: str, schema: StructType,
                 overwrite: bool, codec: str) -> None:
        from pipelines_rj_sms_spark.sources.avroc import (
            spark_to_avro_schema)

        self.path = path
        self.schema = schema
        self.avro_schema = spark_to_avro_schema(schema)
        self.overwrite = overwrite
        self.codec = codec

    def write(self, iterator):
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        from pipelines_rj_sms_spark.sources.avroc import (
            encode_container, row_to_avro)

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        records = [row_to_avro(self.avro_schema, r) for r in iterator]
        fname = f"part-{uuid.uuid4().hex}.avro"
        blob = encode_container(self.avro_schema, records,
                                codec=self.codec)
        with open(os.path.join(staging, fname), "wb") as f:
            f.write(blob)

        class _Msg(WriterCommitMessage):
            pass

        msg = _Msg()
        msg.fname = fname
        msg.n_rows = len(records)
        return msg

    def commit(self, messages) -> None:
        import os
        import shutil

        staging = os.path.join(self.path, "_staging")
        # crash-safety ordering: publish the staged files FIRST, delete
        # stale ones LAST — a driver crash mid-commit then leaves a
        # superset (old + new files) rather than a truncated table.
        # (The jsonl sink's _SUCCESS manifest is the stronger protocol;
        # avro readers key on file presence, so ordering is the guard.)
        stale = ({f for f in os.listdir(self.path) if f.endswith(".avro")}
                 if self.overwrite else set())
        for m in messages:
            if m is None:
                continue
            os.replace(os.path.join(staging, m.fname),
                       os.path.join(self.path, m.fname))
            stale.discard(m.fname)
        for old in stale:
            os.remove(os.path.join(self.path, old))
        shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"),
                      ignore_errors=True)


def register_all(spark) -> None:
    """Register every engine Python data source on the session."""
    spark.dataSource.register(DbfDataSource)
    spark.dataSource.register(ReplayDataSource)
    spark.dataSource.register(AvroDataSource)


# --------------------------------------------------------- JSONL sink (K7+)
# A Python DataSource WRITER with a real two-phase commit protocol —
# the third leg of the Spark-4 Python DataSource surface next to the
# batch reader (dbf) and stream reader (replay). Semantics mirror
# Spark's own file-sink commit: every task writes to a hidden staging
# directory and returns its file name as the commit message; only the
# DRIVER's commit() publishes (atomic per-file rename into the target
# + a _SUCCESS manifest listing exactly the committed files), and
# abort() deletes the orphaned staging files. A reader that honors the
# manifest never observes a half-written batch — task retries and
# speculative duplicates die in staging.


class JsonlCommitDataSource(DataSource):
    """``df.write.format("jsonlcommit").option("path", dir).save()`` —
    newline-delimited JSON with commit-protocol atomicity, no JVM
    writer involved. The record-hub posture of `sinks/rest_hub.py` as
    a first-class writable format (reference K7's batch semantics)."""

    @classmethod
    def name(cls) -> str:
        return "jsonlcommit"

    def writer(self, schema: StructType, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonlcommit requires .option('path', dir)")
        return _JsonlCommitWriter(path, schema, overwrite)


class _JsonlCommitWriter(DataSourceWriter):
    def __init__(self, path: str, schema: StructType,
                 overwrite: bool) -> None:
        self.path = path
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    # -- executor side -------------------------------------------------
    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, fname), "w",
                  encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(
                    {k: row[k] for k in self.fields},
                    default=str) + "\n")
                n += 1

        class _Msg(WriterCommitMessage):
            pass

        msg = _Msg()
        msg.fname = fname
        msg.n_rows = n
        return msg

    # -- driver side ---------------------------------------------------
    def commit(self, messages) -> None:
        import json
        import os
        import shutil

        staging = os.path.join(self.path, "_staging")
        published = []
        total = 0
        if self.overwrite:
            for old in os.listdir(self.path):
                if old.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, old))
        for m in messages:
            if m is None:
                continue
            os.replace(os.path.join(staging, m.fname),
                       os.path.join(self.path, m.fname))
            published.append(m.fname)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w",
                  encoding="utf-8") as f:
            json.dump({"files": sorted(published), "rows": total}, f)
        shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"),
                      ignore_errors=True)
