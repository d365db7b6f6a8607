"""Stage-level profile of llm_kmeans_routed (VERDICT r13 Next #6): split
the entry's ~4.3 s composite cost into (a) per-iteration centroid-state
collects, (b) the final assignment+materialization, (c) the left-anti
totality guard, by timing reconstructed sub-chains in one session.

Usage: python tools/profile_kmeans_r14.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    import aicoe_osc_demo_spark.operators.similarity as sim
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("profile-kmeans")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    fn = QUERIES["llm_kmeans_routed"]
    for r in range(reps):
        t0 = time.time()
        checksum_materialize(fn(spark, sf_dir))
        print(f"full entry rep {r}: {time.time()-t0:.3f}s", flush=True)
        spark.catalog.clearCache()

    # Reconstruct the internal phases of kmeans_quantized(k=4, iters=2,
    # route_min_k=4, nprobe=2, dim=64) over embeddings at sf_dir.
    from aicoe_osc_demo_spark.operators.relational import ensure_parallelism
    from aicoe_osc_demo_spark.plans import load

    emb = load(spark, sf_dir, "embeddings")

    for r in range(reps):
        from pyspark.sql import Window

        t0 = time.time()
        q = emb.select(
            F.col("vec_id"),
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
            ).alias("v"),
        )
        q = ensure_parallelism(q)
        cents = (
            q.orderBy("vec_id")
            .limit(4)
            .select(
                (F.row_number().over(Window.orderBy("vec_id")) - 1)
                .cast("int")
                .alias("cid"),
                F.col("v").alias("s"),
                F.lit(1).cast("long").alias("n"),
            )
        )
        t1 = time.time()
        rows = cents.collect()
        t2 = time.time()
        cents_lr = spark.createDataFrame(rows, schema=cents.schema)
        scores1 = sim._route_assign(q, cents_lr, 4, 2)
        assigned1 = q.join(scores1, "vec_id").select("vec_id", "cid", "v")
        sums = (
            assigned1.select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
        )
        cents2 = sums.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "sx"))), lambda s: s["sx"]
            ).alias("s"),
            F.max("cnt").alias("n"),
        )
        t3 = time.time()
        rows2 = cents2.collect()
        t4 = time.time()
        cents2_lr = spark.createDataFrame(rows2, schema=cents.schema)
        scores2 = sim._route_assign(q, cents2_lr, 4, 2)
        assigned2 = q.join(scores2, "vec_id").select("vec_id", "cid", "v")
        final = (
            assigned2.groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n_vecs"),
                F.sum(
                    F.aggregate("v", F.lit(0).cast("long"), lambda acc, y: acc + y)
                ).alias("mass"),
            )
            .select(F.col("cid").alias("cluster_id"), "n_vecs", "mass")
        )
        n = checksum_materialize(final)
        t5 = time.time()
        print(
            f"rep {r}: plan-build {t1-t0:.3f}s  init-collect {t2-t1:.3f}s  "
            f"iter2-collect(assign1+update) {t4-t3:.3f}s  "
            f"final-assign+rollup+mat {t5-t4:.3f}s  rows {n}",
            flush=True,
        )
        spark.catalog.clearCache()

    print("done")


if __name__ == "__main__":
    main()
