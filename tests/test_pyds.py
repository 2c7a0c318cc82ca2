"""Python DataSource API: DBF as spark.read.format("dbf") — partition
planning per file, executor-side Arrow decode, parity with the
binaryFile-based read_dbf path."""

from pathlib import Path

import pytest

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.sources.pyds import DbfDataSource, register_all
from tests.test_listing_formats_resthub import _write_dbf

FIELDS = [("CNES", 7), ("NOME", 10)]


@pytest.fixture()
def dbf_dir(tmp_path) -> Path:
    _write_dbf(tmp_path / "jan.dbf", FIELDS,
               [["1234567", "POSTO A"], ["7654321", "POSTO B"],
                ["0000000", "DEAD"]], deleted_idx={2})
    _write_dbf(tmp_path / "fev.dbf", FIELDS, [["1111111", "POSTO C"]])
    return tmp_path


def test_format_dbf_reads_and_skips_deleted(spark, dbf_dir):
    register_all(spark)
    df = spark.read.format("dbf").load(str(dbf_dir / "*.dbf"))
    rows = sorted((r["CNES"], r["NOME"]) for r in df.collect())
    assert rows == [("1111111", "POSTO C"), ("1234567", "POSTO A"),
                    ("7654321", "POSTO B")]
    assert all(t == "string" for _, t in df.dtypes)


def test_format_dbf_partitions_per_file(spark, dbf_dir):
    spark.dataSource.register(DbfDataSource)
    df = spark.read.format("dbf").load(str(dbf_dir / "*.dbf"))
    # one source file per task partition; _source_file tracks provenance
    got = {r["_source_file"] for r in df.select("_source_file").collect()}
    assert {Path(p).name for p in got} == {"jan.dbf", "fev.dbf"}
    assert df.rdd.getNumPartitions() == 2


def test_format_dbf_matches_binaryfile_path(spark, dbf_dir):
    """The DataSource and the binaryFile+mapInPandas reader are two
    transports over one parser — results must be identical."""
    from pipelines_rj_sms_spark.sources.formats import read_dbf

    register_all(spark)
    via_ds = spark.read.format("dbf").load(str(dbf_dir / "*.dbf"))
    via_bf = read_dbf(spark, str(dbf_dir / "*.dbf"),
                      str(dbf_dir / "jan.dbf"))
    a = sorted((r["CNES"], r["NOME"]) for r in via_ds.collect())
    b = sorted((r["CNES"], r["NOME"]) for r in via_bf.collect())
    assert a == b
    assert via_ds.columns == via_bf.columns


def test_format_dbf_composes_with_filters(spark, dbf_dir):
    register_all(spark)
    df = (spark.read.format("dbf").load(str(dbf_dir / "*.dbf"))
          .filter("CNES like '1%'").select("NOME"))
    assert sorted(r["NOME"] for r in df.collect()) == ["POSTO A", "POSTO C"]


def test_format_dbf_missing_path_raises(spark, dbf_dir):
    register_all(spark)
    with pytest.raises(Exception, match="no files match"):
        spark.read.format("dbf").load(str(dbf_dir / "*.nope")).collect()


def test_jsonlcommit_writer_commit_protocol(spark, tmp_path):
    """Happy path: partitions stage, driver publishes atomically, the
    _SUCCESS manifest lists exactly the committed files, rows
    round-trip through spark.read.json."""
    import json
    import os

    from pipelines_rj_sms_spark.sources.pyds import JsonlCommitDataSource
    spark.dataSource.register(JsonlCommitDataSource)
    out = tmp_path / "hub"
    out.mkdir()
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")).repartition(4)
    df.write.format("jsonlcommit").option("path", str(out)) \
        .mode("append").save()
    manifest = json.loads((out / "_SUCCESS").read_text())
    files = sorted(p.name for p in out.glob("*.jsonl"))
    assert manifest["files"] == files and manifest["rows"] == 100
    assert not (out / "_staging").exists()      # staging cleaned
    back = spark.read.json(str(out / "*.jsonl"))
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(100))


def test_jsonlcommit_writer_abort_leaves_no_partials(spark, tmp_path):
    """A failing task aborts the batch: no .jsonl files publish, no
    _SUCCESS appears, staging is cleaned — a manifest-honoring reader
    never sees the half-written batch."""
    import pytest

    from pipelines_rj_sms_spark.sources.pyds import JsonlCommitDataSource
    spark.dataSource.register(JsonlCommitDataSource)
    out = tmp_path / "hub2"
    out.mkdir()

    @F.udf("long")
    def boom(x):
        if x == 7:
            raise RuntimeError("injected task failure")
        return x

    df = spark.range(10).select(boom(F.col("id")).alias("id")) \
        .repartition(2)
    with pytest.raises(Exception, match="injected task failure"):
        df.write.format("jsonlcommit").option("path", str(out)) \
            .mode("append").save()
    assert list(out.glob("*.jsonl")) == []
    assert not (out / "_SUCCESS").exists()
    assert not (out / "_staging").exists()


SCHEMA_FULL = {
    "type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "color", "type": {"type": "enum", "name": "c",
                                   "symbols": ["RED", "BLUE"]}},
        {"name": "nested", "type": {
            "type": "record", "name": "n", "fields": [
                {"name": "a", "type": "int"},
                {"name": "b", "type": ["null", "double"]}]}},
    ]}


def _rows(n, offset=0):
    return [(i + offset, None if i % 3 == 0 else f"u{i}",
             i * 0.5, i % 2 == 0, [f"t{i}", "x"], {"k": i},
             "RED" if i % 2 else "BLUE", (i, None if i % 2 else 1.5))
            for i in range(n)]


def test_avro_codec_round_trip_both_codecs():
    from pipelines_rj_sms_spark.sources.avroc import (
        encode_container, read_container)
    rows = _rows(50)
    for codec in ("null", "deflate"):
        blob = encode_container(SCHEMA_FULL, rows, codec=codec,
                                records_per_block=7)
        schema, got = read_container(blob)
        assert list(got) == rows, codec


def test_avro_corrupt_sync_detected():
    import pytest
    from pipelines_rj_sms_spark.sources.avroc import (
        encode_container, read_container)
    blob = bytearray(encode_container(SCHEMA_FULL, _rows(5)))
    blob[-1] ^= 0xFF          # flip a sync-marker byte
    _, records = read_container(bytes(blob))
    with pytest.raises(ValueError, match="sync"):
        list(records)


def test_avro_spark_source_reads_shards(spark, tmp_path):
    """Two shard files through format('pyavro'): schema inferred from
    the header, per-file partitions, nullable union honored."""
    from pipelines_rj_sms_spark.sources.avroc import encode_container
    from pipelines_rj_sms_spark.sources.pyds import AvroDataSource
    (tmp_path / "a.avro").write_bytes(
        encode_container(SCHEMA_FULL, _rows(20), codec="deflate"))
    (tmp_path / "b.avro").write_bytes(
        encode_container(SCHEMA_FULL, _rows(15, offset=100)))
    spark.dataSource.register(AvroDataSource)
    df = spark.read.format("pyavro").load(str(tmp_path / "*.avro"))
    assert df.count() == 35
    assert df.schema["name"].dataType.typeName() == "string"
    assert df.filter("name IS NULL").count() == 7 + 5
    row = df.filter("id = 101").collect()[0]
    assert row["nested"]["a"] == 1 and row["color"] == "RED"
    assert row["props"]["k"] == 1 and row["tags"][1] == "x"
    assert df.rdd.getNumPartitions() == 2


def test_avro_write_read_round_trip(spark, tmp_path):
    """df.write.format('pyavro') → read back: schema and values
    survive, including nulls, arrays, maps, and nested structs; the
    staging dir is gone after commit."""
    import os
    from pyspark.sql import functions as F
    from pipelines_rj_sms_spark.sources.pyds import AvroDataSource
    spark.dataSource.register(AvroDataSource)
    df = spark.createDataFrame(
        [(1, "a", [1, 2], {"k": 1.5}, (7, None)),
         (2, None, [], {}, (8, "x"))],
        "id long, s string, arr array<int>, m map<string,double>, "
        "nested struct<a:int, b:string>")
    out = str(tmp_path / "t")
    df.repartition(2).write.format("pyavro").mode("overwrite").save(out)
    assert not os.path.exists(os.path.join(out, "_staging"))
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 2
    back = spark.read.format("pyavro").load(out + "/*.avro")
    assert back.count() == 2
    r = {x["id"]: x for x in back.collect()}
    assert r[1]["arr"] == [1, 2] and r[1]["m"]["k"] == 1.5
    assert r[1]["nested"]["a"] == 7 and r[1]["nested"]["b"] is None
    assert r[2]["s"] is None and r[2]["arr"] == []
    assert back.schema["m"].dataType.simpleString() == "map<string,double>"
