"""S6 — .xlsx annotation-workbook ingestion without a spark-excel jar.

Reference behavior: ``pd.read_excel(path, sheet_name="data_ex_in_xls")
[columns_to_read]`` per workbook, plus per-file ``annotator`` provenance
(ref: /root/reference/src/components/preprocessing/text_curator.py:111-136,
table_curator.py:367-386, src/components/utils/qa_utils.py:10-42).

Spark shape: ``binaryFile`` scan → ``mapInPandas`` parse of each workbook
executor-side.  Workbook bytes never touch the driver; parallelism comes
from the file scan (annotation sets are many small workbooks — exactly the
shape binaryFile partitions well).  Parser backend per executor:

- ``openpyxl`` when importable (full fidelity), else
- a stdlib SpreadsheetML reader (``zipfile`` + ``ElementTree``) — .xlsx is
  ECMA-376 zipped XML, and annotation workbooks only use shared/inline
  strings and plain numeric cells, all of which the fallback covers.

All data columns are emitted as strings (cast downstream per schema);
``annotator`` is the workbook's basename, exactly the reference's
provenance column.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_NS_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL_ATTR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_NS_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 (SpreadsheetML column letters)."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _cell_text(cell, shared: list[str]) -> str | None:
    kind = cell.get("t", "n")
    if kind == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS_MAIN}t"))
    v = cell.find(f"{_NS_MAIN}v")
    if v is None or v.text is None:
        return None
    if kind == "s":
        return shared[int(v.text)]
    return v.text


def _parse_xlsx_stdlib(data: bytes, sheet_name: str | None = None) -> list[list[str | None]]:
    """Minimal ECMA-376 reader: resolve the sheet (by name via
    workbook.xml + its rels, or the first sheet), decode shared/inline
    strings, return the dense row grid."""
    zf = zipfile.ZipFile(io.BytesIO(data))

    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {r.get("Id"): r.get("Target") for r in rels.iter(_NS_PKG_REL)}
    sheet_path = None
    for sheet in wb.iter(f"{_NS_MAIN}sheet"):
        if sheet_name is None or sheet.get("name") == sheet_name:
            target = rel_target[sheet.get(_NS_REL_ATTR)]
            sheet_path = target.lstrip("/") if target.startswith("/") else posixpath.join("xl", target)
            break
    if sheet_path is None:
        raise ValueError(f"sheet {sheet_name!r} not found in workbook")

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [
            "".join(t.text or "" for t in si.iter(f"{_NS_MAIN}t"))
            for si in sst.iter(f"{_NS_MAIN}si")
        ]

    grid: list[list[str | None]] = []
    for row in ElementTree.fromstring(zf.read(sheet_path)).iter(f"{_NS_MAIN}row"):
        cells: dict[int, str | None] = {}
        for cell in row.iter(f"{_NS_MAIN}c"):
            m = _CELL_REF.match(cell.get("r", ""))
            if not m:
                continue
            cells[_col_index(m.group(1))] = _cell_text(cell, shared)
        width = max(cells) + 1 if cells else 0
        grid.append([cells.get(i) for i in range(width)])
    return grid


def _parse_xlsx_openpyxl(data: bytes, sheet_name: str | None = None) -> list[list[str | None]]:
    from openpyxl import load_workbook  # type: ignore

    wb = load_workbook(io.BytesIO(data), read_only=True, data_only=True)
    ws = wb[sheet_name] if sheet_name else wb.worksheets[0]
    return [
        [None if v is None else str(v) for v in row] for row in ws.iter_rows(values_only=True)
    ]


def parse_workbook(data: bytes, sheet_name: str | None = None) -> pd.DataFrame:
    """Workbook bytes → pandas frame (first row = header), string-typed.
    openpyxl when available, stdlib SpreadsheetML otherwise."""
    try:
        grid = _parse_xlsx_openpyxl(data, sheet_name)
    except ImportError:
        grid = _parse_xlsx_stdlib(data, sheet_name)
    if not grid:
        return pd.DataFrame()
    header = [h if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    width = len(header)
    rows = [r[:width] + [None] * (width - len(r)) for r in grid[1:]]
    return pd.DataFrame(rows, columns=header)


def read_excel_workbooks(
    spark: SparkSession,
    path: str,
    columns_to_read: list[str],
    sheet_name: str | None = None,
) -> DataFrame:
    """S6 — the reference's multi-workbook annotation ingest
    (text_curator.py:124-136): every .xlsx under ``path`` is parsed
    executor-side, validated against ``columns_to_read``, and stamped with
    ``annotator`` = workbook basename."""
    binary = spark.read.format("binaryFile").load(path)
    out_schema = StructType(
        [StructField(c, StringType()) for c in columns_to_read]
        + [StructField("annotator", StringType())]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # one iteration per WORKBOOK (each input row is a whole binary
            # file); zip the two columns directly rather than iterrows
            for path, content in zip(pdf["path"], pdf["content"]):
                frame = parse_workbook(bytes(content), sheet_name)
                missing = [c for c in columns_to_read if c not in frame.columns]
                if missing:
                    raise ValueError(
                        f"annotation workbook {path!r} missing required "
                        f"columns: {missing}"
                    )
                out = frame[columns_to_read].astype(object).where(frame[columns_to_read].notna(), None)
                out = out.map(lambda v: None if v is None else str(v))
                out["annotator"] = posixpath.basename(path)
                yield out

    return binary.select("path", "content").mapInPandas(parse, schema=out_schema)
