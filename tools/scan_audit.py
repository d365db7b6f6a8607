"""Repeated-scan audit: for every registry entry, count `Scan parquet`
nodes per source table in the INITIAL formatted physical plan and report
entries that scan the same table more than once (sum of count-1 over
tables = "repeated scans").  Lazy localCheckpoints hide their upstream
scan — the audit counts what the final job re-executes, which is the
multi-pass term that matters at 100 TB.

Usage: python tools/scan_audit.py [sf_dir] [min_repeats]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    min_repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    total_repeats = 0
    flagged = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}", file=sys.stderr)
            continue
        # detail lines: "(3) Scan parquet \nOutput ...\nLocation: ... [file:/.../orders.parquet]"
        tables: dict[str, int] = {}
        for m in re.finditer(r"\(\d+\) Scan parquet[\s\S]*?Location:[^\n]*?([A-Za-z0-9_]+)\.parquet", plan):
            t = m.group(1)
            tables[t] = tables.get(t, 0) + 1
        repeats = sum(c - 1 for c in tables.values() if c > 1)
        total_repeats += repeats
        if repeats >= min_repeats:
            flagged.append((repeats, name, dict(sorted(tables.items()))))

    flagged.sort(reverse=True)
    for repeats, name, tables in flagged:
        print(f"{repeats:3d}  {name}  {tables}")
    print(f"\ncatalog-wide repeated scans: {total_repeats} over {len(QUERIES)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
