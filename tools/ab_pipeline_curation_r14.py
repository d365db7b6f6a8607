"""Same-session interleaved A/B for pipeline_llm_curation (r14 scan audit:
6 documents scans).  The funnel's tail is referenced ~3x by
mixture_sample (source counts, totals, the rate join-back), re-executing
the whole lang/quality/repetition/PII/fingerprint chain per reference;
the repetition join-back additionally references the gated subtree twice.

v0 = HEAD form
v1 = narrow (doc_id, source, q, fingerprint) projection of `deduped`
     lazily checkpointed before mixture_sample (chain 3x -> 1x)
v2 = v1 + the lang/quality-gated frame checkpointed too (documents scan
     1x total; wide — carries text)

Usage: python tools/ab_pipeline_curation_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _pipe(spark, sf_dir, variant: int):
    from aicoe_osc_demo_spark.operators.quality import mixture_sample
    from aicoe_osc_demo_spark.operators.relational import ensure_parallelism
    from aicoe_osc_demo_spark.plans import load
    from aicoe_osc_demo_spark.plans.quality import (
        doc_fingerprint,
        lang_id,
        pii_redact,
        quality_score,
        repetition_stats,
    )

    d = ensure_parallelism(load(spark, sf_dir, "documents"))
    gated = (
        d.filter(lang_id(F.col("text")) == "en")
        .withColumn("q", F.round(quality_score(F.col("text")), 6))
        .filter(F.col("q") >= 0.6)
    )
    if variant >= 2:
        gated = gated.localCheckpoint(eager=False)
    rep = repetition_stats(gated.select("doc_id", "text"))
    gated = gated.join(rep.select("doc_id", "top_ngram_frac"), on="doc_id").filter(
        F.col("top_ngram_frac") <= 0.3
    )
    gated = gated.withColumn("redacted", pii_redact(F.col("text"))).withColumn(
        "fingerprint", doc_fingerprint(F.col("redacted"))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = (
        gated.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")
    )
    if variant >= 1:
        deduped = deduped.select("doc_id", "source", "q", "fingerprint").localCheckpoint(
            eager=False
        )
    sampled = mixture_sample(deduped, "source").filter(F.col("kept"))
    return sampled.select("doc_id", "source", "q", "fingerprint")


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-pipe-curation")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    base = sorted(map(tuple, QUERIES["pipeline_llm_curation"](spark, sf_dir).collect()))
    for v in (0, 1, 2):
        rows = sorted(map(tuple, _pipe(spark, sf_dir, v).collect()))
        assert rows == base, f"v{v} VALUE MISMATCH"
    print(f"# value-identity OK: {len(base)} rows (v0=v1=v2=entry)", flush=True)
    spark.catalog.clearCache()

    acc = {0: [], 1: [], 2: []}
    for i in range(n_pairs):
        for v in (0, 1, 2):
            t0 = time.time()
            checksum_materialize(_pipe(spark, sf_dir, v))
            acc[v].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    for v in (0, 1, 2):
        print(f"v{v}: best {min(acc[v]):.3f} all {acc[v]}")


if __name__ == "__main__":
    main()
