"""Same-session interleaved A/B (r14): ivf_topk re-folded the query and
candidate norms per PAIR; hoisted to once per vector (the r13
cosine_scores fix).  OLD form reconstructed and monkeypatched per rep.

Usage: python tools/ab_ivf_hoist_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ENTRIES = ["llm_ivf_topk", "llm_ivf_recall"]


def make_old_ivf_topk(sim):
    from aicoe_osc_demo_spark.operators.relational import top_k_per_group

    def old_ivf_topk(
        corpus, queries, k=5, nprobe=2, label_col="label",
        vec_col="embedding", id_col="vec_id",
    ):
        cent = sim.ivf_centroids(corpus, list_col=label_col, vec_col=vec_col).select(
            F.col("ivf_list").alias("bucket"), "centroid"
        )
        q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        probe = top_k_per_group(
            q.crossJoin(F.broadcast(cent)).select(
                "query_id",
                "qv",
                "bucket",
                (sim._dot(F.col("qv"), F.col("centroid"))
                 / (sim._norm(F.col("qv")) * sim._norm(F.col("centroid")))).alias("csim"),
            ),
            ["query_id"],
            F.col("csim"),
            nprobe,
            tiebreak=["bucket"],
        ).select("query_id", "qv", "bucket")
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            F.col(label_col).alias("bucket"),
        )
        cand = c.join(F.broadcast(probe), on="bucket").filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = cand.select(
            "query_id",
            "neighbor_id",
            F.round(
                sim._dot(F.col("qv"), F.col("cv"))
                / (sim._norm(F.col("qv")) * sim._norm(F.col("cv"))),
                6,
            ).alias("cosine"),
        )
        return top_k_per_group(
            scored, ["query_id"], F.col("cosine"), k, tiebreak=["neighbor_id"]
        )

    return old_ivf_topk


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    import aicoe_osc_demo_spark.operators.similarity as sim
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-ivf-hoist")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()

    new_impl = sim.ivf_topk
    old_impl = make_old_ivf_topk(sim)

    for name in ENTRIES:
        fn = QUERIES[name]
        sim.ivf_topk = old_impl
        old_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        sim.ivf_topk = new_impl
        new_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert old_rows == new_rows, f"{name}: VALUE MISMATCH"
        print(f"# {name} value-identity OK: {len(old_rows)} rows", flush=True)
        spark.catalog.clearCache()
        olds, news = [], []
        for i in range(n_pairs):
            for impl, acc in ((old_impl, olds), (new_impl, news)):
                sim.ivf_topk = impl
                t0 = time.time()
                checksum_materialize(fn(spark, sf_dir))
                acc.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        print(f"{name} old: best {min(olds):.3f} all {olds}")
        print(f"{name} new: best {min(news):.3f} all {news}")
    sim.ivf_topk = new_impl


if __name__ == "__main__":
    main()
