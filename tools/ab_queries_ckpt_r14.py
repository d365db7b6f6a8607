"""Same-session interleaved A/B (r14 scan-audit follow-up): three entries
re-expand their tiny bounded query slice per reference —

- llm_ndcg_eval / llm_ann_recall: queries = embeddings[vec_id<5] feeds
  both the LSH leg and the exact leg (4 embeddings scans total);
- llm_bm25_topk: queries = documents[doc_id<5] feeds the distinct term
  set and the scored join (4 documents scans total).

NEW form lazily localCheckpoints the 5-row slice once.

Usage: python tools/ab_queries_ckpt_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _ndcg(spark, sf_dir, ckpt: bool):
    from aicoe_osc_demo_spark.operators.similarity import cosine_topk, lsh_ann_topk
    from aicoe_osc_demo_spark.plans import load
    from aicoe_osc_demo_spark.plans.llm import _ANN_PLANES, _ANN_TABLES

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    if ckpt:
        queries = queries.localCheckpoint(eager=False)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    lsh = (
        lsh_ann_topk(
            emb, queries, k=5, n_tables=_ANN_TABLES,
            planes_per_table=_ANN_PLANES, dim=64,
        )
        .withColumn("pos", F.row_number().over(w))
        .select("query_id", "neighbor_id", "pos")
    )
    exact = (
        cosine_topk(emb, queries, k=5)
        .withColumn("er", F.row_number().over(w))
        .select("query_id", "neighbor_id", "er")
    )
    graded = lsh.join(exact, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        "pos",
        F.coalesce((F.lit(6) - F.col("er")).cast("long"), F.lit(0)).alias("rel"),
    )
    term = F.floor(
        F.col("rel").cast("double") / F.log2(F.col("pos") + 1) * 1e12 + F.lit(0.5)
    ).cast("long")
    dcg = graded.groupBy("query_id").agg(F.sum(term).cast("long").alias("dcg_pico"))
    idcg = spark.range(1, 6).agg(
        F.sum(
            F.floor(
                (F.lit(6) - F.col("id")).cast("double")
                / F.log2(F.col("id") + 1)
                * 1e12
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("idcg_pico")
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        "query_id",
        "dcg_pico",
        F.round(
            F.col("dcg_pico").cast("double") / F.col("idcg_pico").cast("double"), 6
        ).alias("ndcg_at_5"),
    )


def _bm25(spark, sf_dir, ckpt: bool):
    from aicoe_osc_demo_spark.operators.corpus import bm25_topk
    from aicoe_osc_demo_spark.plans import load

    d = load(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ").alias("q_text"),
    )
    if ckpt:
        queries = queries.localCheckpoint(eager=False)
    return bm25_topk(d, queries, k=10, k1=1.5, b=0.75)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-queries-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    for label, builder in (("ndcg", _ndcg), ("bm25", _bm25)):
        old_rows = sorted(map(tuple, builder(spark, sf_dir, False).collect()))
        new_rows = sorted(map(tuple, builder(spark, sf_dir, True).collect()))
        assert old_rows == new_rows, f"{label} VALUE MISMATCH"
        print(f"# {label} value-identity OK: {len(old_rows)} rows", flush=True)
        spark.catalog.clearCache()
        olds, news = [], []
        for i in range(n_pairs):
            for tag, flag, acc in (("old", False, olds), ("new", True, news)):
                t0 = time.time()
                checksum_materialize(builder(spark, sf_dir, flag))
                acc.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        print(f"{label} old: best {min(olds):.3f} all {olds}")
        print(f"{label} new: best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
