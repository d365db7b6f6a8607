"""Same-session interleaved A/B for llm_kmeans_routed (VERDICT r13 Next
#6): OLD = routed Lloyd re-scans + re-quantizes q from parquet in each of
the iters+1 sequential driver jobs; NEW = q lazily localCheckpoint'ed once
(_LLOYD_CKPT_ROUTED_INPUT, the MLlib training-input cache pattern).

Usage: python tools/ab_kmeans_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    import aicoe_osc_demo_spark.operators.similarity as sim
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-kmeans")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    fn = QUERIES["llm_kmeans_routed"]

    sim._LLOYD_CKPT_ROUTED_INPUT = False
    old_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    sim._LLOYD_CKPT_ROUTED_INPUT = True
    new_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert old_rows == new_rows, f"VALUE MISMATCH: {old_rows} vs {new_rows}"
    print(f"# value-identity OK: {len(old_rows)} rows", flush=True)
    spark.catalog.clearCache()

    olds, news = [], []
    for i in range(n_pairs):
        for tag, flag, acc in (("old", False, olds), ("new", True, news)):
            sim._LLOYD_CKPT_ROUTED_INPUT = flag
            t0 = time.time()
            checksum_materialize(fn(spark, sf_dir))
            dt = time.time() - t0
            acc.append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep {i} {tag}: {dt:.3f}s", flush=True)
    sim._LLOYD_CKPT_ROUTED_INPUT = True
    print(f"old: best {min(olds):.3f} all {olds}")
    print(f"new: best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
