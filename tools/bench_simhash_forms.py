"""Adjudicate the two SimHash formulations (VERDICT r3 item 4).

Form A (r2, "map-side HOF"): per-row hash array, 32 interpreted F.aggregate
higher-order passes, no shuffle.
Form B (r3, "exploded"): posexplode shingles, 32 branchless popcount sums in
one codegen'd groupBy with map-side partial combine.

Measured on (1) the real sf0.1 documents table (short sentence-ish docs) and
(2) a long-document fixture (each doc repeated to ~page size), best-of-3
after warmup, on the same session bench.py uses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from aicoe_osc_demo_spark.operators.dedup import word_ngrams
from aicoe_osc_demo_spark.operators.dedup import simhash as simhash_exploded
from aicoe_osc_demo_spark.session import get_spark
from aicoe_osc_demo_spark.sources.tables import load_table


def simhash_mapside(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            word_ngrams(F.col(text_col), 3),
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        ).alias("hs"),
    )

    def voter(j: int):
        mask = F.lit(1 << j)
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1))

    fp = None
    for j in range(bits):
        vote = F.aggregate(F.col("hs"), F.lit(0), voter(j))
        term = F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return hashed.select("doc_id", fp.cast("long").alias("simhash"))


def best_of(fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-simhash", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    avg_len = docs.select(F.avg(F.length("text"))).first()[0]
    print(f"short fixture: {n} docs, avg {avg_len:.0f} chars")

    # long-document fixture: repeat each text ~20x with a per-copy suffix so
    # shingles don't collapse to one repeated gram set (page-sized docs)
    long_docs = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.array(*[F.concat(F.col("text"), F.lit(f" v{i}")) for i in range(20)]),
        ).alias("text"),
    ).localCheckpoint()  # materialize so generation cost is excluded
    avg_long = long_docs.select(F.avg(F.length("text"))).first()[0]
    print(f"long fixture: {n} docs, avg {avg_long:.0f} chars")

    for label, data in (("short", docs), ("long", long_docs)):
        # warmup both
        simhash_mapside(data).count()
        simhash_exploded(data).count()
        a = best_of(lambda: simhash_mapside(data).count())
        b = best_of(lambda: simhash_exploded(data).count())
        print(f"{label}: mapside-HOF {a:.3f}s   exploded {b:.3f}s   load {os.getloadavg()}")


if __name__ == "__main__":
    main()
