"""Tests: file listing (S11/S12), DBF/encoding/archive formats (F2-F9),
REST record sink (K7)."""

import json
import struct
import zipfile
from pathlib import Path

import pytest

from pipelines_rj_sms_spark.sources.listing import (
    latest_per_key_from_filename,
    list_files,
)
from pipelines_rj_sms_spark.sources.formats import (
    detect_encoding,
    read_dbc,
    read_dbf,
    unpack_archive,
)
from pipelines_rj_sms_spark.sinks.rest_hub import write_records_http


def _write_dbf(path: Path, fields: list[tuple[str, int]],
               rows: list[list[str]], deleted_idx: set[int] = frozenset()) -> None:
    """Minimal dBase III writer for fixtures."""
    record_size = 1 + sum(l for _, l in fields)
    header_size = 32 + 32 * len(fields) + 1
    buf = bytearray(32)
    buf[0] = 0x03
    struct.pack_into("<IHH", buf, 4, len(rows), header_size, record_size)
    for name, length in fields:
        desc = bytearray(32)
        desc[:11] = name.encode("ascii").ljust(11, b"\x00")
        desc[11] = ord("C")
        desc[16] = length
        buf += desc
    buf += b"\x0d"
    for i, row in enumerate(rows):
        buf += b"\x2a" if i in deleted_idx else b"\x20"
        for (_, length), val in zip(fields, row):
            buf += val.encode("latin-1")[:length].ljust(length, b" ")
    buf += b"\x1a"
    path.write_bytes(bytes(buf))


def test_list_files_metadata_only(spark, tmp_path):
    (tmp_path / "a.csv").write_text("x\n1\n")
    (tmp_path / "b.txt").write_text("y")
    df = list_files(spark, str(tmp_path), suffix=".csv")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["path"].endswith("a.csv")
    assert "content" not in df.columns


def test_latest_per_key_from_filename(spark, tmp_path):
    for name in ["cnes123_2024-01-01.csv", "cnes123_2024-02-01.csv",
                 "cnes456_2024-01-15.csv"]:
        (tmp_path / name).write_text("x\n")
    files = list_files(spark, str(tmp_path))
    latest = latest_per_key_from_filename(
        files, key_pattern=r"cnes(\d+)_", date_pattern=r"_(\d{4}-\d{2}-\d{2})\.csv$",
    )
    got = {r["file_key"]: str(r["file_date"]) for r in latest.collect()}
    assert got == {"123": "2024-02-01", "456": "2024-01-15"}


def test_read_dbf_distributed(spark, tmp_path):
    fields = [("CNES", 7), ("NOME", 10)]
    _write_dbf(tmp_path / "jan.dbf", fields,
               [["1234567", "POSTO A"], ["7654321", "POSTO B"], ["0000000", "DEAD"]],
               deleted_idx={2})
    _write_dbf(tmp_path / "fev.dbf", fields, [["1111111", "POSTO C"]])
    df = read_dbf(spark, str(tmp_path / "*.dbf"), str(tmp_path / "jan.dbf"))
    rows = sorted((r["CNES"], r["NOME"]) for r in df.collect())
    assert rows == [("1111111", "POSTO C"), ("1234567", "POSTO A"),
                    ("7654321", "POSTO B")]  # deleted row skipped
    assert all(t == "string" for _, t in df.dtypes)


def test_read_dbc_missing_files(spark):
    with pytest.raises(FileNotFoundError, match="no DBC files"):
        read_dbc(spark, "/nonexistent/*.dbc")


def test_read_dbc_end_to_end(spark, tmp_path):
    """Full DBC path, no stubs: fixture .dbc files are genuinely
    PKWare-imploded (pkdcl.implode_literal), decoded by the built-in
    pure-Python explode, then distributed-parsed by read_dbf."""
    from pipelines_rj_sms_spark.sources.pkdcl import implode_literal

    def write_dbc(path, fields, rows):
        dbf_path = path.with_suffix(".tmp")
        _write_dbf(dbf_path, fields, rows)
        dbf = dbf_path.read_bytes()
        dbf_path.unlink()
        hlen = struct.unpack_from("<H", dbf, 8)[0]
        path.write_bytes(dbf[:hlen] + b"\x00\x00\x00\x00"
                         + implode_literal(dbf[hlen:]))

    fields = [("CNES", 7), ("NOME", 10)]
    write_dbc(tmp_path / "jan.dbc", fields,
              [["1234567", "POSTO A"], ["7654321", "POSTO B"]])
    write_dbc(tmp_path / "fev.dbc", fields, [["1111111", "POSTO C"]])

    out_dir = tmp_path / "decoded"
    out_dir.mkdir()
    df = read_dbc(spark, str(tmp_path / "*.dbc"), tmp_dir=str(out_dir))
    rows = sorted((r["CNES"], r["NOME"]) for r in df.collect())
    assert rows == [("1111111", "POSTO C"), ("1234567", "POSTO A"),
                    ("7654321", "POSTO B")]
    # decoded files landed where directed
    assert sorted(p.name for p in out_dir.glob("*.dbf")) == \
        ["fev.dbf", "jan.dbf"]


def test_detect_encoding(tmp_path):
    utf = tmp_path / "u.csv"
    utf.write_text("ação;médico\n", encoding="utf-8")
    cp = tmp_path / "c.csv"
    cp.write_bytes("ação;médico\n".encode("cp1252"))
    assert detect_encoding(str(utf)) == "utf-8"
    assert detect_encoding(str(cp)) == "cp1252"


def test_unpack_archive_selective(tmp_path):
    z = tmp_path / "a.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("data/x.csv", "a,b\n1,2\n")
        zf.writestr("readme.txt", "ignore")
    out = unpack_archive(str(z), str(tmp_path / "out"), suffixes=(".csv",))
    assert len(out) == 1 and out[0].endswith("x.csv")
    assert Path(out[0]).read_text() == "a,b\n1,2\n"


def test_write_records_http_batches(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "CAST(id * 2 AS STRING) AS v").coalesce(2)
    sink_dir = tmp_path / "posts"
    sink_dir.mkdir()
    sink = str(sink_dir)

    def fake_poster(url, records):
        # executor-side: append one line per batch to a shared dir
        import os, uuid  # noqa: PLC0415
        p = os.path.join(sink, f"{uuid.uuid4()}.json")
        with open(p, "w") as f:
            json.dump({"url": url, "n": len(records), "records": records}, f)

    write_records_http(df, "http://hub/records", batch_size=3, poster=fake_poster)
    batches = [json.load(open(p)) for p in Path(sink).glob("*.json")]
    assert sum(b["n"] for b in batches) == 10
    assert all(b["n"] <= 3 for b in batches)
    all_ids = sorted(r["id"] for b in batches for r in b["records"])
    assert all_ids == list(range(10))


def test_write_records_http_retries(spark, tmp_path):
    df = spark.range(3).coalesce(1)
    marker = tmp_path / "attempts"
    marker.mkdir()
    m = str(marker)

    def flaky_poster(url, records):
        import os, uuid  # noqa: PLC0415
        n_prev = len(os.listdir(m))
        open(os.path.join(m, str(uuid.uuid4())), "w").close()
        if n_prev == 0:
            raise ConnectionError("transient")

    write_records_http(df, "http://hub", poster=flaky_poster,
                       max_retries=3, backoff_s=0.01)
    assert len(list(marker.iterdir())) == 2  # one failure + one success


def test_fetch_windows_executor_side(spark):
    from pipelines_rj_sms_spark.functions.dates import hour_windows
    from pipelines_rj_sms_spark.sources.api import fetch_windows

    wins = hour_windows(spark, "2024-01-01 00:00:00", "2024-01-01 06:00:00", hours=2)

    def fetcher(ws, we):
        if "04:00" in ws:
            raise ValueError("gateway timeout")
        return {"window": ws, "n": 7}

    out = fetch_windows(wins, fetcher, max_retries=2).collect()
    by_start = {r["window_start"]: r for r in out}
    assert len(out) == 4  # 00,02,04,06 starts (inclusive sequence)
    ok = [r for r in out if r["status"] == "ok"]
    assert len(ok) == 3
    assert json.loads(by_start["2024-01-01 04:00:00"]["payload"])["error"].startswith("gateway")


def test_read_json_quarantine_routes_bad_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pipelines_rj_sms_spark.sources.files import read_json_quarantine

    p = tmp_path / "mixed.json"
    p.write_text("\n".join([
        '{"id": 1, "name": "ok"}',
        '{"id": "not-a-number", "name": "bad type"}',
        'not json at all {{{',
        '{"id": 3, "name": "fine"}',
    ]))
    schema = StructType([StructField("id", LongType()),
                         StructField("name", StringType())])
    good, bad = read_json_quarantine(spark, str(p), schema)
    assert sorted((r.id, r.name) for r in good.collect()) == [
        (1, "ok"), (3, "fine")]
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json at all" in r for r in raws)
    assert any("not-a-number" in r for r in raws)
