"""CI-lite degenerate-input sweep: the whole query catalog on 0-row tables.

The manual tool (tools/empty_input_sweep.py) generates the per-round
EDGECHECK artifact; this test keeps the invariant alive for every FUTURE
entry without relying on anyone re-running the tool — an entry added next
round that crashes on empty input fails the suite, not the next audit.

At 100 TB, empty inputs are routine (partition-pruned reads, a quiet day
of events, a new tenant's corpus): every entry must either return a
well-formed possibly-empty DataFrame or refuse with a DOCUMENTED
ValueError — never an IndexError from `.collect()[0]`, an ANSI
divide-by-zero, or a `max()` over nothing.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(spark):
    from tools.empty_input_sweep import TABLES, build_empty_dir

    out = build_empty_dir(spark, SF_DIR, n_rows=0)
    # pin the r9 judge finding: the built dir must ACTUALLY be empty (the
    # `if n_rows:` refactor silently skipped limit(0) and swept full tables)
    for t in TABLES:
        assert spark.read.parquet(f"{out}/{t}.parquet").count() == 0, t
    yield out
    import shutil

    shutil.rmtree(out, ignore_errors=True)


def test_build_empty_dir_zero_rows_is_actually_empty(spark, empty_dir):
    # the fixture's per-table assertion IS the test; this names it in the
    # report so a regression is attributed to the builder, not the sweep
    from tools.empty_input_sweep import TABLES

    counts = {
        t: spark.read.parquet(f"{empty_dir}/{t}.parquet").count() for t in TABLES
    }
    assert counts == {t: 0 for t in TABLES}


def test_entire_catalog_survives_empty_input(spark, empty_dir):
    import __spark_entry__ as entrymod

    crashed: list[str] = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, empty_dir).collect()
        except ValueError:
            pass  # documented refusal (e.g. unbounded-window fences)
        except Exception as e:  # noqa: BLE001
            crashed.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
        spark.catalog.clearCache()
    assert not crashed, "\n".join(crashed)
