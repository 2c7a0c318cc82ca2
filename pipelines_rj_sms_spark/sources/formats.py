"""Format decoders beyond CSV/JSON/Parquet (SURVEY §2.2).

- F2/F3: DBF (dBase III, the DATASUS interchange format;
  reference pipelines/datalake/utils/data_transformations.py:121-129 uses
  pyreaddbc/simpledbf). Implemented here as a pure-Python parser of the
  public dBase III layout, distributed per-file via the binaryFile reader
  + mapInPandas: each executor task parses whole files from the `content`
  bytes, so a directory of thousands of DATASUS files scales with the
  cluster, not the driver. DBC (compressed DBF) decodes through the
  built-in pure-Python PKWare DCL codec (`sources/pkdcl.py`) — no
  native dependency.
- F4: XLSX — built-in stdlib parse (zipfile + ElementTree over the
  OOXML parts): shared strings, inline strings, cached formula
  values; no openpyxl. Driver-side decode -> all-string
  createDataFrame (report-sized workbooks; columnar data belongs in
  parquet/CSV).
- F7: encoding detection as a driver pre-pass (the reference chardets the
  first bytes: vitacare_gdrive/utils.py:388-453); here strict-decode
  trials over a candidate list, latin-1 as the never-fails fallback.
- F9: zip/tar.gz selective unpack (utils/tasks.py:628-645,
  prontuario_gcs/tasks.py:56-92) — a driver/fetch-stage step.

All-string output everywhere (the reference's dtype=str posture).
"""

from __future__ import annotations

import struct
import tarfile
import zipfile
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


# --------------------------------------------------------------- DBF (F2/F3)

def _parse_dbf_fields(header: bytes) -> list[tuple[str, int]]:
    """Field descriptors: 32-byte entries from offset 32 until 0x0D."""
    fields: list[tuple[str, int]] = []
    off = 32
    while off < len(header) and header[off] != 0x0D:
        desc = header[off:off + 32]
        if len(desc) < 32:
            break
        name = desc[:11].split(b"\x00")[0].decode("ascii", "replace").strip()
        length = desc[16]
        fields.append((name, length))
        off += 32
    return fields


def _parse_dbf_bytes(content: bytes, encoding: str) -> tuple[list[str], list[list[str]]]:
    """Decode one DBF file: (column names, rows-as-strings).

    Header: record count at bytes 4-8 (LE), header size at 8-10, record
    size at 10-12; each record = 1 deletion-flag byte + fixed-width fields;
    0x2A marks deleted rows (skipped).
    """
    if len(content) < 32:
        raise ValueError("truncated DBF header")
    n_records, header_size, record_size = struct.unpack_from("<IHH", content, 4)
    fields = _parse_dbf_fields(content[:header_size])
    names = [n for n, _ in fields]
    rows: list[list[str]] = []
    off = header_size
    for _ in range(n_records):
        rec = content[off:off + record_size]
        off += record_size
        if len(rec) < record_size or rec[0:1] == b"\x2a":
            continue
        row, pos = [], 1
        for _, length in fields:
            row.append(rec[pos:pos + length].decode(encoding, "replace").strip())
            pos += length
        rows.append(row)
    return names, rows


def dbf_schema(sample_path: str, encoding: str = "latin-1") -> StructType:
    """Driver pre-pass: column names from one file's header (footer-free
    format — only the first KB is read)."""
    with open(sample_path, "rb") as f:
        head = f.read(32)
        header_size = struct.unpack_from("<H", head, 8)[0]
        f.seek(0)
        header = f.read(header_size)
    names = [n for n, _ in _parse_dbf_fields(header)]
    return StructType(
        [StructField(n, StringType()) for n in names]
        + [StructField("_source_file", StringType())]
    )


def read_dbf(spark: SparkSession, path_glob: str, sample_path: str,
             encoding: str = "latin-1") -> DataFrame:
    """F3: distributed DBF read — binaryFile rows (one per file) parsed on
    executors. All files must share the layout of ``sample_path`` (the
    DATASUS convention: one schema per dataset, many monthly files)."""
    schema = dbf_schema(sample_path, encoding)
    names = schema.fieldNames()[:-1]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, r in pdf.iterrows():
                cols, rows = _parse_dbf_bytes(bytes(r["content"]), encoding)
                for row in rows:
                    aligned = dict(zip(cols, row))
                    out_rows.append([aligned.get(n, "") for n in names] + [r["path"]])
            yield pd.DataFrame(out_rows, columns=schema.fieldNames())

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(parse, schema)


def read_dbc(spark: SparkSession, path_glob: str,
             sample_path: str | None = None, encoding: str = "latin-1",
             tmp_dir: str | None = None) -> DataFrame:
    """F2: DBC = PKWare-imploded DBF, the DATASUS distribution format
    (reference: datalake/utils/data_transformations.py:121-125).

    Decompression is the built-in pure-Python PKWare DCL decoder
    (`sources/pkdcl.py` — no native dependency), file-by-file on the
    driver: DBC files arrive via FTP at single-digit-MB scale, so this
    is a fetch-stage step like the archive unpack, not a distributed
    one. The decoded .dbf files then flow through ``read_dbf``'s
    binaryFile+mapInPandas distributed parse. ``tmp_dir`` overrides
    where the decoded files land.
    """
    from pipelines_rj_sms_spark.sources.pkdcl import dbc_to_dbf_bytes

    import glob as _glob
    import tempfile

    files = sorted(_glob.glob(path_glob))
    if not files:
        raise FileNotFoundError(f"no DBC files match {path_glob}")
    out_dir = tmp_dir or tempfile.mkdtemp(prefix="dbc2dbf_")
    for f in files:
        out = Path(out_dir) / (Path(f).stem + ".dbf")
        out.write_bytes(dbc_to_dbf_bytes(Path(f).read_bytes()))
    sample = sample_path or str(Path(out_dir) / (Path(files[0]).stem + ".dbf"))
    return read_dbf(spark, str(Path(out_dir) / "*.dbf"), sample, encoding)


# --------------------------------------------------------------- XLSX (F4)

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_RNS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
             "relationships}")


def _col_index(cell_ref: str) -> int:
    """'B7' -> 1 (0-based column index from the letter prefix)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _xlsx_cell_text(cell, shared: list[str]) -> str:
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(
            el.text or "" for el in cell.iter(f"{_XLSX_NS}t"))
    v = cell.find(f"{_XLSX_NS}v")
    raw = v.text if v is not None and v.text is not None else ""
    if t == "s":
        return shared[int(raw)] if raw else ""
    if t == "b":
        return "TRUE" if raw == "1" else "FALSE"
    return raw


def parse_xlsx_rows(path: str, sheet: str | int = 0) -> list[list[str]]:
    """Decode one worksheet to all-string rows using only the stdlib
    (zipfile + ElementTree) — XLSX is a zip of XML parts. No openpyxl
    dependency; iterparse keeps memory at one row, not one workbook.
    """
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(path) as zf:
        # workbook: ordered sheet name -> relationship id
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = [
            (s.get("name"), s.get(f"{_XLSX_RNS}id"))
            for s in wb.iter(f"{_XLSX_NS}sheet")
        ]
        if isinstance(sheet, int):
            name, rid = sheets[sheet]
        else:
            matches = [(n, r) for n, r in sheets if n == sheet]
            if not matches:
                raise KeyError(f"sheet {sheet!r} not in {[n for n, _ in sheets]}")
            name, rid = matches[0]
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target = next(
            r.get("Target") for r in rels
            if r.get("Id") == rid
        )
        sheet_path = "xl/" + target.lstrip("/").removeprefix("xl/")

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t"))
                for si in ss.iter(f"{_XLSX_NS}si")
            ]

        rows: list[list[str]] = []
        with zf.open(sheet_path) as f:
            for _event, el in ET.iterparse(f):
                if el.tag != f"{_XLSX_NS}row":
                    continue
                out: list[str] = []
                for cell in el.iter(f"{_XLSX_NS}c"):
                    ref = cell.get("r")
                    ci = _col_index(ref) if ref else len(out)
                    while len(out) <= ci:
                        out.append("")
                    out[ci] = _xlsx_cell_text(cell, shared)
                rows.append(out)
                el.clear()
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def read_xlsx(spark: SparkSession, path: str, sheet: str | int = 0,
              header: bool = True) -> DataFrame:
    """F4: XLSX -> all-string DataFrame, the reference's
    `pd.read_excel(dtype=str)` posture (reference:
    datalake/utils/data_transformations.py:130-131) without the
    openpyxl dependency — stdlib zip+XML decode on the driver.
    Workbooks are small config/report artifacts in the reference, so
    driver decode + createDataFrame is the right cost model; bulk
    tabular data goes through the CSV/parquet readers.
    """
    rows = parse_xlsx_rows(path, sheet)
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    if header:
        names, data = list(rows[0]), rows[1:]
        # blank/duplicate header cells get positional fallbacks
        seen: dict[str, int] = {}
        for i, n in enumerate(names):
            n = n or f"_c{i}"
            if n in seen:
                seen[n] += 1
                n = f"{n}_{seen[n]}"
            else:
                seen[n] = 0
            names[i] = n
    else:
        names = [f"_c{i}" for i in range(len(rows[0]))]
        data = rows
    from pipelines_rj_sms_spark.sources.files import all_string_schema

    return spark.createDataFrame(data, all_string_schema(names))


# ----------------------------------------------------- encoding probe (F7)

def detect_encoding(path: str, candidates: tuple[str, ...] = ("utf-8", "cp1252"),
                    sample_bytes: int = 1 << 20) -> str:
    """F7: first candidate that strictly decodes a head sample; latin-1
    (never fails) as the fallback — mirrors the reference's chardet +
    cp1252/cp850 repair posture without the dependency."""
    with open(path, "rb") as f:
        sample = f.read(sample_bytes)
    for enc in candidates:
        try:
            sample.decode(enc)
            return enc
        except UnicodeDecodeError:
            continue
    return "latin-1"


# ------------------------------------------------------- archives (F9)

def unpack_archive(archive_path: str, out_dir: str,
                   suffixes: tuple[str, ...] | None = None) -> list[str]:
    """F9: unpack zip / tar(.gz), optionally only members with the given
    suffixes. Returns extracted paths. Fetch-stage (driver) step — the
    extracted files then flow through the distributed readers."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    extracted: list[str] = []

    def want(name: str) -> bool:
        return not suffixes or any(name.lower().endswith(s) for s in suffixes)

    if zipfile.is_zipfile(archive_path):
        with zipfile.ZipFile(archive_path) as zf:
            for m in zf.namelist():
                if not m.endswith("/") and want(m):
                    zf.extract(m, out)
                    extracted.append(str(out / m))
    elif tarfile.is_tarfile(archive_path):
        with tarfile.open(archive_path) as tf:
            for m in tf.getmembers():
                if m.isfile() and want(m.name):
                    tf.extract(m, out, filter="data")
                    extracted.append(str(out / m.name))
    else:
        raise ValueError(f"not a zip or tar archive: {archive_path}")
    return extracted
