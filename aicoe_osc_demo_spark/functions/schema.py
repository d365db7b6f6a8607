"""Schema utilities — F3 snakify and F4 DDL generation.

Reference: ``snakify``/``pandas_type_to_sql`` in
/root/reference/notebooks/demo1[depracated]/demo1-create-tables.ipynb (cell 9):
column names are casefolded, trimmed, punctuation-stripped, whitespace and
underscore runs collapsed, abbreviation-rewritten, length-capped, and checked
for uniqueness; pandas dtypes are mapped to SQL types for Trino DDL.  In Spark
the DDL mapping is free (``df.schema.toDDL()``); snakify stays driver-side
logic over ``df.columns``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_ABBREVIATIONS = {
    "average": "avg",
    "maximum": "max",
    "minimum": "min",
    "number": "num",
    "percentage": "pct",
    "standard deviation": "std",
}


def snakify(name: str, maxlen: int = 63) -> str:
    s = name.casefold().strip()
    for long, short in _ABBREVIATIONS.items():
        s = s.replace(long, short)
    s = re.sub(r"[^\w\s]", "", s)
    s = re.sub(r"[\s_]+", "_", s).strip("_")
    return s[:maxlen]


def snakify_columns(df: DataFrame, maxlen: int = 63) -> DataFrame:
    new = [snakify(c, maxlen) for c in df.columns]
    if len(set(new)) != len(new):
        dupes = sorted({c for c in new if new.count(c) > 1})
        raise ValueError(f"snakify produced duplicate column names: {dupes}")
    return df.toDF(*new)


def schema_ddl(df: DataFrame) -> str:
    """F4 — the pandas_type_to_sql + DDL-text generation collapses to Spark's
    own schema serialization."""
    return df.schema.toDDL()
