"""Same-session interleaved A/B for llm_bleu_doc_pairs (VERDICT r13 Next
#7): OLD form (cand/ref doc_id-pushdown slices re-expanded 3x each — 6
documents scans) vs NEW form (the two 25-row bounded slices lazily
localCheckpoint'ed once each — 2 documents scans).

Usage: python tools/ab_bleu_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _bleu(spark, sf_dir, materialize: bool):
    from aicoe_osc_demo_spark.plans import load

    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    cand = d.filter(F.col("doc_id") < 25).select(
        F.col("doc_id").alias("qid"), toks.alias("toks")
    )
    ref = d.filter((F.col("doc_id") >= 25) & (F.col("doc_id") < 50)).select(
        (F.col("doc_id") - 25).alias("qid"), toks.alias("toks")
    )
    if materialize:
        cand = cand.localCheckpoint(eager=False)
        ref = ref.localCheckpoint(eager=False)

    def grams(df, n):
        if n == 1:
            g = F.col("toks")
        else:
            g = F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        return df.select("qid", F.explode(g).alias("g")).groupBy("qid", "g").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )

    def precis(n, tot, clip):
        cg = grams(cand, n).withColumnRenamed("c", "cc")
        rg = grams(ref, n).withColumnRenamed("c", "rc")
        return (
            cg.join(rg, ["qid", "g"], "left")
            .groupBy("qid")
            .agg(
                F.sum("cc").cast("long").alias(tot),
                F.sum(F.least(F.col("cc"), F.coalesce(F.col("rc"), F.lit(0))))
                .cast("long")
                .alias(clip),
            )
        )

    lens = cand.select("qid", F.size("toks").cast("long").alias("c_len")).join(
        ref.select("qid", F.size("toks").cast("long").alias("r_len")), "qid"
    )
    s1 = precis(1, "tot1", "clip1")
    s2 = precis(2, "tot2", "clip2")
    p1 = F.col("clip1").cast("double") / F.col("tot1").cast("double")
    p2 = F.col("clip2").cast("double") / F.col("tot2").cast("double")
    bp_log = F.least(
        F.lit(0.0),
        1.0 - F.col("r_len").cast("double") / F.col("c_len").cast("double"),
    )
    out = (
        lens.join(s1, "qid")
        .join(s2, "qid", "left")
        .select(
            "qid",
            "c_len",
            "r_len",
            "clip1",
            "tot1",
            F.coalesce("clip2", F.lit(0)).cast("long").alias("clip2"),
            F.coalesce("tot2", F.lit(0)).cast("long").alias("tot2"),
        )
    )
    return out.select(
        "qid",
        "c_len",
        "r_len",
        "clip1",
        "tot1",
        "clip2",
        "tot2",
        F.round(p1, 6).alias("p1"),
        F.when(F.col("tot2") > 0, F.round(p2, 6)).alias("p2"),
        F.when(
            (F.col("clip1") > 0) & (F.col("clip2") > 0),
            F.floor((bp_log + (F.log(p1) + F.log(p2)) / 2.0) * 1e6 + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("log_bleu_u"),
    )


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-bleu")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()

    # value-identity: old inline form vs the registry entry vs new form
    entry_rows = sorted(map(tuple, QUERIES["llm_bleu_doc_pairs"](spark, sf_dir).collect()))
    old_rows = sorted(map(tuple, _bleu(spark, sf_dir, False).collect()))
    new_rows = sorted(map(tuple, _bleu(spark, sf_dir, True).collect()))
    assert old_rows == entry_rows, "inline OLD form != registry entry"
    assert old_rows == new_rows, "VALUE MISMATCH old vs new"
    print(f"# value-identity OK: {len(old_rows)} rows", flush=True)
    spark.catalog.clearCache()

    olds, news = [], []
    for i in range(n_pairs):
        for tag, flag, acc in (("old", False, olds), ("new", True, news)):
            t0 = time.time()
            checksum_materialize(_bleu(spark, sf_dir, flag))
            dt = time.time() - t0
            acc.append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep {i} {tag}: {dt:.3f}s", flush=True)
    print(f"old: best {min(olds):.3f} all {olds}")
    print(f"new: best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
