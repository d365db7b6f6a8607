"""Bounded-memory sketch operators.

``heavy_hitters`` — distributed Misra-Gries: each partition summarizes its
token stream with at most ``capacity`` counters (bounded executor memory no
matter how large the vocabulary), the partial summaries merge by summation
(an upper-bound sketch), and the surviving candidates are re-counted EXACTLY
with a semi-join before the final top-k.  The Misra-Gries guarantee — any
item with frequency > n/capacity survives every partial pass — means the
exact-recount output equals the true top-k whenever k's frequency floor
clears n/capacity, which is what makes the operator oracle-checkable while
still being a genuine sketch (the full-vocabulary groupBy never happens).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_MG_SCHEMA = StructType(
    [StructField("item", StringType()), StructField("mg_count", LongType())]
)


def _misra_gries(stream, capacity: int) -> dict[str, int]:
    counters: dict[str, int] = {}
    for item in stream:
        if item in counters:
            counters[item] += 1
        elif len(counters) < capacity:
            counters[item] = 1
        else:
            for k in list(counters):
                counters[k] -= 1
                if counters[k] == 0:
                    del counters[k]
    return counters


def heavy_hitters(
    items: DataFrame, item_col: str, k: int, capacity: int = 256
) -> DataFrame:
    """Exact top-k frequent items via a Misra-Gries candidate sketch.

    Phase 1 (sketch, bounded memory): per-partition Misra-Gries summaries.
    Phase 2 (candidates): merge summaries, keep the top ``capacity`` by
    upper-bound count — a tiny candidate set.
    Phase 3 (exact): re-count ONLY the candidates with a broadcast semi-join
    and take the true top-k (count desc, item asc).
    """

    def sketch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[item_col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        yield pd.DataFrame(
            {"item": list(counters.keys()), "mg_count": list(counters.values())}
        )

    partials = items.select(F.col(item_col)).mapInPandas(sketch_partition, schema=_MG_SCHEMA)
    candidates = (
        partials.groupBy("item")
        .agg(F.sum("mg_count").alias("ub"))
        .orderBy(F.col("ub").desc(), F.col("item").asc())
        .limit(capacity)
        .select("item")
    )
    exact = (
        items.join(F.broadcast(candidates), items[item_col] == candidates["item"], "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.orderBy(F.col("n").desc(), F.col(item_col).asc())
        .limit(k)
        .withColumnRenamed(item_col, "item")
    )
