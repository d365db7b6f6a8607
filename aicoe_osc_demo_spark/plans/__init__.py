"""Query catalog — the registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers a named query over the driver's test tables, and —
wherever the semantics are ANSI-SQL-expressible — a DuckDB oracle statement
producing identical column names/values.  Names are stable; the driver's
correctness gate keys on them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        # a duplicate name silently shadows the earlier plan (this bit
        # events_retention_cohorts in r7/r8) — fail loudly instead
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import load_table

    return load_table(spark, sf_dir, name)


# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import ml  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
