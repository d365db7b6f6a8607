"""Same-session interleaved A/B (r14): pq_adc_topk's query-side LUT input
was an m-way unionByName (m scans of the queries source) and, on the
cache_lut=False serving path, the LUT lineage re-expands m+1 times.  NEW
form = ONE explode pass + a lazy checkpoint of the bounded qsub when not
persisting the LUT.  OLD form reconstructed and monkeypatched per rep.

Usage: python tools/ab_pq_lut_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ENTRIES = [
    "llm_pq_adc_topk",
    "llm_ivfpq_topk",
    "llm_pq_refine_topk",
    "llm_ivfpq_recall",
    "llm_pq_recall",
]


def make_old_pq_adc_topk(sim):
    from aicoe_osc_demo_spark.operators.relational import top_k_per_group

    def old_pq_adc_topk(
        codes, codebooks, queries, k=5, m=4, vec_col="embedding",
        id_col="query_id", dim=64, scale=1000, _prejoined=False,
        cache_lut=True, scope=None,
    ):
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        d_sub = dim // m
        qsub = None
        for j in range(m):
            piece = queries.select(
                F.col(id_col).alias("query_id"),
                F.lit(j).alias("sub"),
                F.transform(
                    F.slice(F.col(vec_col), j * d_sub + 1, d_sub),
                    lambda x: F.round(x.cast("double") * scale).cast("long"),
                ).alias("qv"),
            )
            qsub = piece if qsub is None else qsub.unionByName(piece)
        num = F.aggregate(
            F.zip_with("qv", "s", lambda x, s: (F.col("n") * x - s) * (F.col("n") * x - s)),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        )
        lut = qsub.join(F.broadcast(codebooks), on="sub").select(
            "query_id",
            "sub",
            "cid",
            (num.cast("double") / (F.col("n") * F.col("n")).cast("double")).alias("d"),
        )
        if cache_lut:
            lut = lut.persist()
            if scope is not None:
                scope.add(lut)
        if _prejoined:
            out = codes
        else:
            out = codes.crossJoin(F.broadcast(lut.select("query_id").distinct()))
        dist = None
        for j in range(m):
            lj = lut.filter(F.col("sub") == j).select(
                F.col("query_id").alias(f"q{j}"),
                F.col("cid").alias(f"c{j}"),
                F.col("d").alias(f"d{j}"),
            )
            out = out.join(
                F.broadcast(lj),
                on=[
                    F.col("query_id") == F.col(f"q{j}"),
                    F.element_at(F.col("codes"), j + 1) == F.col(f"c{j}"),
                ],
            ).drop(f"q{j}", f"c{j}")
            dist = F.col(f"d{j}") if dist is None else dist + F.col(f"d{j}")
        scored = out.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dist, 6).alias("adc_dist"),
        )
        res = top_k_per_group(
            scored, ["query_id"], -F.col("adc_dist"), k, tiebreak=["neighbor_id"]
        )
        if cache_lut and scope is None:
            res = res.localCheckpoint(eager=True)
            lut.unpersist(blocking=True)
        return res

    return old_pq_adc_topk


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    import aicoe_osc_demo_spark.operators.similarity as sim
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-pq-lut")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    new_impl = sim.pq_adc_topk
    old_impl = make_old_pq_adc_topk(sim)

    for name in ENTRIES:
        fn = QUERIES[name]
        sim.pq_adc_topk = old_impl
        old_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        sim.pq_adc_topk = new_impl
        new_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert old_rows == new_rows, f"{name}: VALUE MISMATCH"
        print(f"# {name} value-identity OK: {len(old_rows)} rows", flush=True)
        spark.catalog.clearCache()
        olds, news = [], []
        for i in range(n_pairs):
            for impl, acc in ((old_impl, olds), (new_impl, news)):
                sim.pq_adc_topk = impl
                t0 = time.time()
                checksum_materialize(fn(spark, sf_dir))
                acc.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        print(f"{name} old: best {min(olds):.3f} all {olds}")
        print(f"{name} new: best {min(news):.3f} all {news}")
    sim.pq_adc_topk = new_impl


if __name__ == "__main__":
    main()
