"""Same-session interleaved A/B (r14): dedup_clusters' per-round
localCheckpoints are EAGER (one driver job per checkpoint site per round);
the k-core/label_propagation r13 pattern makes them LAZY so each round's
materialization folds into the next driver action (the convergence probe
or the caller's job).  Times the cluster-loop family.

Usage: python tools/ab_clusters_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ENTRIES = [
    "llm_semantic_dedup",
    "llm_keep_canonical",
    "llm_leakage_safe_split",
    "llm_dedup_cluster_sizes",
]


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    import aicoe_osc_demo_spark.operators.dedup as dd
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-clusters")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    for name in ENTRIES:
        fn = QUERIES[name]
        dd._CLUSTER_CKPT_EAGER = True
        old_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        dd._CLUSTER_CKPT_EAGER = False
        new_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert old_rows == new_rows, f"{name} VALUE MISMATCH"
        print(f"# {name} value-identity OK: {len(old_rows)} rows", flush=True)
        spark.catalog.clearCache()
        olds, news = [], []
        for i in range(n_pairs):
            for flag, acc in ((True, olds), (False, news)):
                dd._CLUSTER_CKPT_EAGER = flag
                t0 = time.time()
                checksum_materialize(fn(spark, sf_dir))
                acc.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        print(f"{name} old(eager): best {min(olds):.3f} all {olds}")
        print(f"{name} new(lazy):  best {min(news):.3f} all {news}")
    dd._CLUSTER_CKPT_EAGER = True


if __name__ == "__main__":
    main()
