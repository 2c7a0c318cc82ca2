"""Pure-Python Avro Object Container File codec (public format spec,
https://avro.apache.org/docs/ — no native/avro-package dependency).

The reference stack exchanges BigQuery/GCS extracts where Avro is the
default container (BQ extract jobs emit Avro unless told otherwise);
vanilla PySpark only reads it through the external spark-avro package,
which is not baked into this container. This module implements the
container format directly — header/metadata map, sync-marked data
blocks, null + deflate codecs, and the binary encoding for the types a
tabular extract uses: primitives, records (nested), union-with-null
(nullable columns), arrays, maps, enums, fixed — and exposes it to
Spark through the Python DataSource in `sources/pyds.py` (format
"pyavro", one InputPartition per file, executor-side decode).

Scale notes: decode is per-file on executors (the BQ-extract shape is
many ~100 MB-bounded shards, so per-file partitions spread evenly);
the driver touches only the first file's header for schema inference.
Blocks are decoded streaming — one block's records in memory at a
time, never the whole file. An ``encode_container`` half makes the
format round-trippable (fixture generation, and a practical small-side
export); it is the same spec, so the round-trip property test pins
both directions.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import types as T

MAGIC = b"Obj\x01"


# ---------------------------------------------------------- varint core

def _write_long(out: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_long(buf: io.BufferedIOBase) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BufferedIOBase) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------- schema

def schema_to_spark(schema) -> T.DataType:
    """Avro schema (parsed JSON) → Spark DataType. Unions are only
    supported in the [null, X] / [X, null] nullable form (the tabular
    shape); logical types decode as their underlying primitive."""
    if isinstance(schema, str):
        prim = {
            "null": T.NullType(), "boolean": T.BooleanType(),
            "int": T.IntegerType(), "long": T.LongType(),
            "float": T.FloatType(), "double": T.DoubleType(),
            "bytes": T.BinaryType(), "string": T.StringType(),
        }
        if schema not in prim:
            raise ValueError(f"unsupported avro type {schema!r}")
        return prim[schema]
    if isinstance(schema, list):
        others = [s for s in schema if s != "null"]
        if len(others) != 1 or "null" not in schema:
            raise ValueError("only [null, X] unions are supported")
        return schema_to_spark(others[0])
    t = schema["type"]
    if t == "record":
        return T.StructType([
            T.StructField(f["name"], schema_to_spark(f["type"]), True)
            for f in schema["fields"]])
    if t == "array":
        return T.ArrayType(schema_to_spark(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(),
                         schema_to_spark(schema["values"]), True)
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    return schema_to_spark(t)  # {"type": "string", "logicalType": ...}


# ---------------------------------------------------------- decode

def _decode(schema, buf: io.BufferedIOBase):
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return buf.read(1) == b"\x01"
        if schema in ("int", "long"):
            return _read_long(buf)
        if schema == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return _read_bytes(buf)
        if schema == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported avro type {schema!r}")
    if isinstance(schema, list):
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    t = schema["type"]
    if t == "record":
        return tuple(_decode(f["type"], buf) for f in schema["fields"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)  # block byte size — skippable hint
                n = -n
            out.extend(_decode(schema["items"], buf)
                       for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
        return out
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    return _decode(t, buf)


def read_header(buf: io.BufferedIOBase) -> tuple[dict, str, bytes]:
    """Read container header → (schema_json, codec, sync_marker)."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    return schema, codec, sync


def read_container(data: bytes) -> tuple[dict, Iterator[tuple]]:
    """Decode a whole container file → (schema_json, record iterator).
    Records of a record-typed schema come back as tuples in field
    order; block-at-a-time memory footprint."""
    buf = io.BytesIO(data)
    schema, codec, sync = read_header(buf)

    def _records():
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, io.SEEK_CUR)
            n = _read_long(buf)
            block = _read_bytes(buf)
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            bb = io.BytesIO(block)
            for _ in range(n):
                yield _decode(schema, bb)
            if buf.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")

    return schema, _records()


# ---------------------------------------------------------- encode

def _encode(schema, val, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            out.write(b"\x01" if val else b"\x00")
        elif schema in ("int", "long"):
            _write_long(out, int(val))
        elif schema == "float":
            out.write(struct.pack("<f", float(val)))
        elif schema == "double":
            out.write(struct.pack("<d", float(val)))
        elif schema == "bytes":
            _write_long(out, len(val))
            out.write(val)
        elif schema == "string":
            raw = val.encode("utf-8")
            _write_long(out, len(raw))
            out.write(raw)
        else:
            raise ValueError(f"unsupported avro type {schema!r}")
        return
    if isinstance(schema, list):
        idx = schema.index("null") if val is None else \
            next(i for i, s in enumerate(schema) if s != "null")
        _write_long(out, idx)
        _encode(schema[idx], val, out)
        return
    t = schema["type"]
    if t == "record":
        for f, v in zip(schema["fields"], val):
            _encode(f["type"], v, out)
    elif t == "array":
        if val:
            _write_long(out, len(val))
            for v in val:
                _encode(schema["items"], v, out)
        _write_long(out, 0)
    elif t == "map":
        if val:
            _write_long(out, len(val))
            for k, v in val.items():
                raw = k.encode("utf-8")
                _write_long(out, len(raw))
                out.write(raw)
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(val))
    elif t == "fixed":
        out.write(val)
    else:
        _encode(t, val, out)


def encode_container(schema: dict, records: list, codec: str = "null",
                     records_per_block: int = 1000) -> bytes:
    """Encode records (tuples in field order for record schemas) into
    a spec-complete container file — the round-trip half."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = bytes((i * 73 + 11) % 256 for i in range(16))
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("ascii")}
    _write_long(out, len(meta))
    for k, v in meta.items():
        raw = k.encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
        _write_long(out, len(v))
        out.write(v)
    _write_long(out, 0)
    out.write(sync)
    for i in range(0, len(records), records_per_block):
        chunk = records[i:i + records_per_block]
        body = io.BytesIO()
        for rec in chunk:
            _encode(schema, rec, body)
        raw = body.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            raw = comp.compress(raw) + comp.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(raw))
        out.write(raw)
        out.write(sync)
    return out.getvalue()


def spark_to_avro_schema(schema: T.StructType,
                         name: str = "spark_export") -> dict:
    """Spark StructType → Avro record schema (the write-side inverse
    of :func:`schema_to_spark`). Every field is emitted as the
    nullable [null, X] union — Spark columns are nullable by default
    and Avro unions cost one varint per value. Nested structs, arrays
    and string-keyed maps map directly; unsupported Spark types raise
    rather than corrupt."""
    def conv(dt: T.DataType, path: str):
        prim = {T.BooleanType: "boolean", T.IntegerType: "int",
                T.ShortType: "int", T.ByteType: "int",
                T.LongType: "long", T.FloatType: "float",
                T.DoubleType: "double", T.BinaryType: "bytes",
                T.StringType: "string"}
        for k, v in prim.items():
            if isinstance(dt, k):
                return v
        if isinstance(dt, T.StructType):
            return {"type": "record", "name": path.replace(".", "_"),
                    "fields": [
                        {"name": f.name,
                         "type": ["null", conv(f.dataType,
                                               f"{path}.{f.name}")]}
                        for f in dt.fields]}
        if isinstance(dt, T.ArrayType):
            return {"type": "array",
                    "items": ["null", conv(dt.elementType,
                                           path + ".item")]}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("avro maps require string keys")
            return {"type": "map",
                    "values": ["null", conv(dt.valueType,
                                            path + ".value")]}
        raise ValueError(f"unsupported Spark type for avro: {dt}")

    return {"type": "record", "name": name,
            "fields": [{"name": f.name,
                        "type": ["null", conv(f.dataType, f.name)]}
                       for f in schema.fields]}


def row_to_avro(schema: dict, row) -> tuple:
    """Spark Row → the tuple shape ``encode_container`` expects for a
    record schema (recursing into nested structs/arrays/maps)."""
    def conv(s, v):
        if v is None:
            return None
        if isinstance(s, list):
            other = next(x for x in s if x != "null")
            return conv(other, v)
        if isinstance(s, dict):
            t = s["type"]
            if t == "record":
                return tuple(conv(f["type"], v[f["name"]])
                             for f in s["fields"])
            if t == "array":
                return [conv(s["items"], x) for x in v]
            if t == "map":
                return {k: conv(s["values"], x)
                        for k, x in v.items()}
        if s == "bytes":
            return bytes(v)
        return v

    return tuple(conv(f["type"], row[f["name"]])
                 for f in schema["fields"])
