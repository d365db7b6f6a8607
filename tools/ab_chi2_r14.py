"""Same-session interleaved A/B for quality_chi2_independence (VERDICT r13
Next #4): OLD form (bounded obs table re-expanded — 7 documents aggregates)
vs NEW form (obs lazily localCheckpoint'ed once — 1 documents aggregate).

Usage: python tools/ab_chi2_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _chi2(spark, sf_dir, materialize_obs: bool):
    from aicoe_osc_demo_spark.plans import load

    d = load(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )
    obs = d.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("long").alias("o"))
    if materialize_obs:
        obs = obs.localCheckpoint(eager=False)
    rt = obs.groupBy("source").agg(F.sum("o").cast("long").alias("r_tot"))
    ct = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("c_tot"))
    n = obs.agg(F.sum("o").cast("long").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(obs), on=["source", "lang"], how="left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    e = F.col("r_tot").cast("double") * F.col("c_tot") / F.col("n")
    t_micro = F.floor(F.pow(F.col("o") - e, 2) / e * 1e6 + F.lit(0.5)).cast("long")
    terms = grid.select(t_micro.alias("t_micro"))
    dims = (
        rt.agg(F.count(F.lit(1)).alias("nr"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("nc")))
        .crossJoin(n.select(F.col("n").alias("nn")))
    )
    chi2_exact = F.col("chi2_micro").cast("double") / 1e6
    defined = (F.col("nr") > 1) & (F.col("nc") > 1)
    return (
        terms.crossJoin(F.broadcast(dims))
        .groupBy("nr", "nc", "nn")
        .agg(F.sum("t_micro").alias("chi2_micro"))
        .select(
            F.col("nr").cast("long").alias("n_rows"),
            F.col("nc").cast("long").alias("n_cols"),
            F.when(
                (F.col("nr") > 0) & (F.col("nc") > 0),
                ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long"),
            ).alias("dof"),
            F.when(defined, F.round(chi2_exact, 6)).alias("chi2"),
            F.when(
                defined,
                F.round(
                    F.sqrt(
                        chi2_exact
                        / (F.col("nn") * F.least(F.col("nr") - 1, F.col("nc") - 1))
                    ),
                    6,
                ),
            ).alias("cramers_v"),
        )
    )


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-chi2")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()

    old_rows = sorted(map(tuple, _chi2(spark, sf_dir, False).collect()))
    new_rows = sorted(map(tuple, _chi2(spark, sf_dir, True).collect()))
    assert old_rows == new_rows, f"VALUE MISMATCH: {old_rows} vs {new_rows}"
    print(f"# value-identity OK: {len(old_rows)} rows", flush=True)
    spark.catalog.clearCache()

    olds, news = [], []
    for i in range(n_pairs):
        for tag, flag, acc in (("old", False, olds), ("new", True, news)):
            t0 = time.time()
            checksum_materialize(_chi2(spark, sf_dir, flag))
            dt = time.time() - t0
            acc.append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep {i} {tag}: {dt:.3f}s", flush=True)
    print(f"old: best {min(olds):.3f} all {olds}")
    print(f"new: best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
