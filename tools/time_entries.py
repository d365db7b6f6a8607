"""Time individual catalog entries exactly as bench.py does (best-of-N
checksum materialization, clearCache between entries).

Usage: python tools/time_entries.py [-n REPS] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("time-entries")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()
    for name in args:
        fn = QUERIES[name]
        times = []
        for _ in range(reps):
            t0 = time.time()
            n = checksum_materialize(fn(spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        print(f"{name}: best {min(times):.2f}s  all {times}  rows {n}", flush=True)


if __name__ == "__main__":
    main()
