"""Sources & sinks (SURVEY.md §2.1, S1-S12).

The reference moves data through per-file CSV/JSON/Excel/Parquet artifacts on
S3 (``/root/reference/src/data/s3_communication.py:12-147``); in Spark all of
that collapses into format readers/writers over ``s3a://`` (or local) URIs —
the IO layer below disappears into Hadoop committers.  What remains worth
owning is: explicit schemas, table registration, provenance columns, and the
binary-document scan used by the PDF pipeline.
"""

from .tables import TPCH_TABLES, load_table, register_views, table_path
from .files import (
    read_csv,
    write_csv,
    read_json,
    write_json,
    read_parquet,
    write_parquet,
    write_table,
    read_binary_docs,
    read_jsonl_chunked,
    read_annotation_workbooks,
)
from .excel import parse_workbook, read_excel_workbooks

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "register_views",
    "table_path",
    "read_csv",
    "write_csv",
    "read_json",
    "write_json",
    "read_parquet",
    "write_parquet",
    "write_table",
    "read_binary_docs",
    "read_jsonl_chunked",
    "read_annotation_workbooks",
    "parse_workbook",
    "read_excel_workbooks",
]
