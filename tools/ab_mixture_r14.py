"""Same-session interleaved A/B (r14): mixture_sample's bounded per-source
counts table is referenced twice (totals + rates), so the input chain runs
3x (counts leg twice + the final rate join).  NEW form lazily checkpoints
counts: inherent two-pass (one counts pass + one rate join).

Times llm_mixture_sample and llm_temperature_mixture shapes.

Usage: python tools/ab_mixture_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _mix(spark, sf_dir, ckpt: bool, group_col="source"):
    from aicoe_osc_demo_spark.plans import load

    df = load(spark, sf_dir, "documents")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_s"))
    if ckpt:
        counts = counts.localCheckpoint(eager=False)
    tot = counts.agg(
        F.sum("n_s").cast("double").alias("n_total"),
        F.sum(F.sqrt(F.col("n_s").cast("double"))).alias("z"),
    )
    rates = counts.join(F.broadcast(tot)).select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                * F.col("n_total")
                * F.sqrt(F.col("n_s").cast("double"))
                / F.col("z")
                / F.col("n_s").cast("double"),
            ),
            6,
        ).alias("rate"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return df.join(F.broadcast(rates), on=group_col).select(
        "doc_id", group_col, "rate", (u < F.col("rate")).alias("kept")
    )


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-mixture")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()

    old_rows = sorted(map(tuple, _mix(spark, sf_dir, False).collect()))
    new_rows = sorted(map(tuple, _mix(spark, sf_dir, True).collect()))
    assert old_rows == new_rows, "VALUE MISMATCH"
    print(f"# value-identity OK: {len(old_rows)} rows", flush=True)
    spark.catalog.clearCache()

    olds, news = [], []
    for i in range(n_pairs):
        for tag, flag, acc in (("old", False, olds), ("new", True, news)):
            t0 = time.time()
            checksum_materialize(_mix(spark, sf_dir, flag))
            acc.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    print(f"old: best {min(olds):.3f} all {olds}")
    print(f"new: best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
