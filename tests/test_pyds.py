"""Python DataSource API: DBF as spark.read.format("dbf") — partition
planning per file, executor-side Arrow decode, parity with the
binaryFile-based read_dbf path."""

from pathlib import Path

import pytest

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
