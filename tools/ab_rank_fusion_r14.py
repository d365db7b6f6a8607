"""Same-session interleaved A/B for the r14 shared-postings rank_fusion
rewrite: OLD form (two corpus token passes — bm25_topk + separate tf leg,
the r13 round-close shape) vs NEW form (one materialized matched-postings
table feeding both legs, QUERIES["llm_rank_fusion"]).

Reps alternate old/new in ONE session (the r13 contention-burst lesson:
cross-session numbers on this box are not comparable).

Usage: python tools/ab_rank_fusion_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def old_rank_fusion(spark, sf_dir):
    from aicoe_osc_demo_spark.operators.corpus import bm25_topk, rank_fusion
    from aicoe_osc_demo_spark.plans import load

    d = load(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ").alias("q_text"),
    )
    bm25 = bm25_topk(d, queries, k=10, k1=1.5, b=0.75).select("q_id", "doc_id", "rank")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    qt = queries.select(
        "q_id",
        F.explode(F.array_distinct(F.split(F.col("q_text"), " "))).alias("term"),
    )
    tf_scored = (
        toks.join(F.broadcast(qt), on="term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    tf_ranked = (
        tf_scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "doc_id", "rank")
    )
    return rank_fusion([bm25, tf_ranked], k=60, topk=10)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-rank-fusion")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    # value-identity check first: same rows from both forms
    old_rows = sorted(map(tuple, old_rank_fusion(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, QUERIES["llm_rank_fusion"](spark, sf_dir).collect()))
    assert old_rows == new_rows, (
        f"VALUE MISMATCH: old {len(old_rows)} rows vs new {len(new_rows)} rows"
    )
    print(f"# value-identity OK: {len(old_rows)} rows", flush=True)
    spark.catalog.clearCache()

    olds, news = [], []
    for i in range(n_pairs):
        for tag, fn, acc in (
            ("old", lambda: old_rank_fusion(spark, sf_dir), olds),
            ("new", lambda: QUERIES["llm_rank_fusion"](spark, sf_dir), news),
        ):
            t0 = time.time()
            checksum_materialize(fn())
            dt = time.time() - t0
            acc.append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep {i} {tag}: {dt:.3f}s", flush=True)
    print(f"old: best {min(olds):.3f} all {olds}")
    print(f"new: best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
