"""Same-session interleaved A/B for llm_novelty_score (r14 find): the
reference gram set is a FILTER of the scored corpus (every 10th doc), so
ref-membership can ride a same-key window (max(flag) OVER (PARTITION BY
g)) on the ONE shingle pass instead of a second tokenize+md5 pass +
distinct + join (guide §2.4).

OLD: g LEFT JOIN (distinct grams of docs%10==0)  — 2 corpus shingle passes
NEW: max(is_ref) window over the gram partition  — 1 pass, 1 exchange

Usage: python tools/ab_novelty_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def new_novelty(spark, sf_dir):
    from aicoe_osc_demo_spark.operators.dedup import _shingles
    from aicoe_osc_demo_spark.plans import load

    docs = load(spark, sf_dir, "documents")
    g = _shingles(docs, "text", "doc_id", 3).select(
        "doc_id", F.substring(F.md5("w"), 1, 16).alias("g")
    )
    in_ref = F.max(
        F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0)
    ).over(Window.partitionBy("g"))
    return (
        g.withColumn("_seen", in_ref)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("_seen") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            F.col("doc_id"),
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams") * 100, 6
            ).alias("novelty_pct"),
        )
    )


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-novelty")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()

    old_fn = QUERIES["llm_novelty_score"]
    old_rows = sorted(map(tuple, old_fn(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, new_novelty(spark, sf_dir).collect()))
    assert old_rows == new_rows, (
        f"VALUE MISMATCH: {len(old_rows)} vs {len(new_rows)} rows; "
        f"first diff {next((a, b) for a, b in zip(old_rows, new_rows) if a != b)}"
    )
    print(f"# value-identity OK: {len(old_rows)} rows", flush=True)
    spark.catalog.clearCache()

    olds, news = [], []
    for i in range(n_pairs):
        for tag, fn, acc in (
            ("old", lambda: old_fn(spark, sf_dir), olds),
            ("new", lambda: new_novelty(spark, sf_dir), news),
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
