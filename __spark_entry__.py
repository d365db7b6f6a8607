"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``aicoe_osc_demo_spark/``; this module just
exposes its query catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the demo1-equivalent
    multi-join revenue rollup (left join + broadcast dims + group-by SUM —
    demo1-join-tables.ipynb cells 7-9 / Superset slice 7 shape)."""
    from aicoe_osc_demo_spark.plans import QUERIES

    return QUERIES["join_multiway_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from aicoe_osc_demo_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from aicoe_osc_demo_spark.plans import ORACLE

    return dict(ORACLE)
