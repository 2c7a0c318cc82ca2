"""XLSX reader (F4): stdlib zip+XML decode, no openpyxl dependency.

The fixture is a hand-built minimal-but-valid workbook exercising the
format's corners: shared strings (including multi-run <si>), numeric and
boolean cells, inline strings, sparse rows, and multiple sheets.
"""

import zipfile

import pytest

from pipelines_rj_sms_spark.sources.formats import parse_xlsx_rows, read_xlsx


def _make_xlsx(path):
    ct = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/>
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""
    root_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Dados" sheetId="1" r:id="rId1"/><sheet name="Extra" sheetId="2" r:id="rId2"/></sheets>
</workbook>"""
    wb_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    ss = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>cnes</t></si><si><t>nome</t></si><si><r><t>POSTO </t></r><r><t>A</t></r></si>
</sst>"""
    sheet1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1"><v>9</v></c></row>
<row r="2"><c r="A2"><v>123</v></c><c r="B2" t="s"><v>2</v></c><c r="C2" t="b"><v>1</v></c></row>
<row r="3"><c r="A3"><v>4.5</v></c><c r="C3" t="inlineStr"><is><t>inline,text</t></is></c></row>
</sheetData>
</worksheet>"""
    sheet2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData><row r="1"><c r="A1"><v>42</v></c></row></sheetData>
</worksheet>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/sharedStrings.xml", ss)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_parse_xlsx_rows(tmp_path):
    p = tmp_path / "wb.xlsx"
    _make_xlsx(p)
    rows = parse_xlsx_rows(str(p), 0)
    assert rows == [
        ["cnes", "nome", "9"],
        ["123", "POSTO A", "TRUE"],
        ["4.5", "", "inline,text"],
    ]
    assert parse_xlsx_rows(str(p), "Extra") == [["42"]]
    with pytest.raises(KeyError):
        parse_xlsx_rows(str(p), "Nope")


def test_read_xlsx_all_string_dataframe(spark, tmp_path):
    p = tmp_path / "wb.xlsx"
    _make_xlsx(p)
    df = read_xlsx(spark, str(p))
    # blank header cell C1 -> numeric "9" is a valid name; all strings
    assert df.columns == ["cnes", "nome", "9"]
    assert all(t == "string" for _, t in df.dtypes)
    got = sorted(tuple(r) for r in df.collect())
    assert got == [("123", "POSTO A", "TRUE"), ("4.5", "", "inline,text")]

    df2 = read_xlsx(spark, str(p), sheet="Extra", header=False)
    assert df2.columns == ["_c0"]
    assert [r["_c0"] for r in df2.collect()] == ["42"]
