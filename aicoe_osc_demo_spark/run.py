"""CLI runner: execute any catalog query by name against a test-data dir.

    python -m aicoe_osc_demo_spark.run <query> [--sf-dir DIR] [--explain] [--limit N]
    python -m aicoe_osc_demo_spark.run --list
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("query", nargs="?", help="query name from the catalog")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--limit", type=int, default=20)
    parser.add_argument("--explain", action="store_true", help="print the physical plan")
    parser.add_argument("--list", action="store_true", dest="list_queries")
    args = parser.parse_args(argv)

    from .plans import ORACLE, QUERIES

    if args.list_queries or not args.query:
        try:
            for name in sorted(QUERIES):
                marker = "oracle" if name in ORACLE else "rows-only"
                print(f"{name}  [{marker}]")
        except BrokenPipeError:
            pass  # `run --list | head` closes the pipe early; not an error
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (use --list)", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(f"run-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    # show() executes once with its own limit pushdown; no second full
    # execution just to print a count
    df.show(args.limit, truncate=80)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
