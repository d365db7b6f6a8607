"""Same-session interleaved A/B for llm_ndcg_eval (VERDICT r13 Next #5):
the r13 composite showed it as the round's one >10% adverse mover
(1.59 -> 1.81) and it shares the touched cosine_scores path.  A/B the
CURRENT form against the PRE-HOIST cosine_scores (per-pair norm folds,
reconstructed from 27b800f~1) by monkeypatching the operator module,
alternating rep by rep in one session.

Usage: python tools/ab_ndcg_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    import aicoe_osc_demo_spark.operators.similarity as sim
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    new_cosine_scores = sim.cosine_scores

    def old_cosine_scores(
        corpus: DataFrame, queries: DataFrame, vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        # pre-27b800f form: per-pair norm folds
        q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        return (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    sim._dot(F.col("qv"), F.col("cv"))
                    / (sim._norm(F.col("qv")) * sim._norm(F.col("cv"))),
                    6,
                ).alias("cosine"),
            )
        )

    spark = get_spark("ab-ndcg")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    fn = QUERIES["llm_ndcg_eval"]

    sim.cosine_scores = old_cosine_scores
    old_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    sim.cosine_scores = new_cosine_scores
    new_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert old_rows == new_rows, f"VALUE MISMATCH: {old_rows} vs {new_rows}"
    print(f"# value-identity OK: {len(old_rows)} rows", flush=True)
    spark.catalog.clearCache()

    olds, news = [], []
    for i in range(n_pairs):
        for tag, impl, acc in (
            ("old", old_cosine_scores, olds),
            ("new", new_cosine_scores, news),
        ):
            sim.cosine_scores = impl
            t0 = time.time()
            checksum_materialize(fn(spark, sf_dir))
            dt = time.time() - t0
            acc.append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep {i} {tag}: {dt:.3f}s", flush=True)
    sim.cosine_scores = new_cosine_scores
    print(f"old(pre-hoist): best {min(olds):.3f} all {olds}")
    print(f"new(current):   best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
