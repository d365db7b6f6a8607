"""Smoke: every registered query runs at sf0.001 and yields a stable schema.

The value-level correctness gate is tools/check_correctness.py (DuckDB
oracle); this test just guarantees no registered query ever throws.
"""

from __future__ import annotations

import pytest

from aicoe_osc_demo_spark.plans import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns  # schema resolved
    assert df.count() >= 0


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
