"""S6 — .xlsx annotation ingestion (text_curator.py:111-136 semantics).

The fixture builder writes genuine ECMA-376 workbooks (zip of SpreadsheetML
parts) shaped like the reference's ``data/annotations/`` files: a
``data_ex_in_xls`` data sheet (plus a decoy sheet), shared-string,
inline-string, numeric and empty cells.
"""

from __future__ import annotations

import zipfile

import pytest

from aicoe_osc_demo_spark.sources.excel import parse_workbook, read_excel_workbooks

_SHEET_FMT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    "<sheetData>{rows}</sheetData></worksheet>"
)


def _wb(path, sheets: dict[str, str], shared: list[str]):
    """Write a minimal valid .xlsx: workbook + rels + sheets + sharedStrings."""
    sheet_xml = []
    rels = []
    for i, name in enumerate(sheets, start=1):
        sheet_xml.append(
            f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>'
        )
        rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
            'package/2006/content-types"/>',
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships"><sheets>{"".join(sheet_xml)}</sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{"".join(rels)}</Relationships>',
        )
        sst = "".join(f"<si><t>{s}</t></si>" for s in shared)
        zf.writestr(
            "xl/sharedStrings.xml",
            '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/'
            f'spreadsheetml/2006/main">{sst}</sst>',
        )
        for i, rows in enumerate(sheets.values(), start=1):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", _SHEET_FMT.format(rows=rows))


def _cell(ref, value, kind=None):
    if kind == "s":
        return f'<c r="{ref}" t="s"><v>{value}</v></c>'
    if kind == "inline":
        return f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>'
    return f'<c r="{ref}"><v>{value}</v></c>'


# header: company | year | answer ; shared strings indexed 0..3
_DATA_ROWS = (
    "<row r=\"1\">" + _cell("A1", 0, "s") + _cell("B1", 1, "s") + _cell("C1", 2, "s") + "</row>"
    "<row r=\"2\">" + _cell("A2", 3, "s") + _cell("B2", 2016) + _cell("C2", "net zero", "inline") + "</row>"
    "<row r=\"3\">" + _cell("A3", 3, "s") + _cell("B3", 2017) + "</row>"  # empty answer cell
)
_DECOY_ROWS = '<row r="1">' + _cell("A1", 0, "s") + "</row>"
_SHARED = ["company", "year", "answer", "OscCorp"]


def _write_fixture(tmp_path, name="alice.xlsx"):
    p = tmp_path / name
    _wb(
        p,
        {"decoy_sheet": _DECOY_ROWS, "data_ex_in_xls": _DATA_ROWS},
        _SHARED,
    )
    return p


def test_parse_workbook_by_sheet_name(tmp_path):
    p = _write_fixture(tmp_path)
    frame = parse_workbook(p.read_bytes(), sheet_name="data_ex_in_xls")
    assert list(frame.columns) == ["company", "year", "answer"]
    assert frame["company"].tolist() == ["OscCorp", "OscCorp"]
    assert frame["year"].tolist() == ["2016", "2017"]
    assert frame["answer"].tolist() == ["net zero", None]


def test_parse_workbook_missing_sheet(tmp_path):
    p = _write_fixture(tmp_path)
    with pytest.raises(ValueError, match="not found"):
        parse_workbook(p.read_bytes(), sheet_name="nope")


def test_read_excel_workbooks_spark(spark, tmp_path):
    _write_fixture(tmp_path, "alice.xlsx")
    _write_fixture(tmp_path, "bob.xlsx")
    out = read_excel_workbooks(
        spark, str(tmp_path), ["company", "year", "answer"], sheet_name="data_ex_in_xls"
    )
    rows = sorted(
        (r.annotator, r.company, r.year, r.answer) for r in out.collect()
    )
    assert len(rows) == 4
    assert {r[0] for r in rows} == {"alice.xlsx", "bob.xlsx"}  # provenance
    assert rows[0][1:] == ("OscCorp", "2016", "net zero")
    # schema is stable strings + annotator
    assert out.columns == ["company", "year", "answer", "annotator"]


def test_read_excel_workbooks_missing_column(spark, tmp_path):
    _write_fixture(tmp_path)
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="missing required"):
        read_excel_workbooks(
            spark, str(tmp_path), ["company", "nope"], sheet_name="data_ex_in_xls"
        ).collect()
