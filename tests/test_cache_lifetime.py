"""Cache-lifetime contract (cache.py): operators that persist internal
artifacts must not accumulate storage across composed calls.

Default path: the operator pins its (small) result and releases every
artifact before returning — two composed searches leave at most two
result-sized blocks, never the index artifacts.
Scope path: persists register with the caller's CacheScope, the plan
stays lazy, and ``release()`` verifiably frees the blocks.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aicoe_osc_demo_spark.cache import CacheScope


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _emb_df(spark, n=40, dim=8, seed=11):
    random.seed(seed)
    rows = [(i, [random.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ivfpq_default_path_releases_index_artifacts(spark):
    from aicoe_osc_demo_spark.operators.similarity import ivfpq_topk

    df = _emb_df(spark)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n0 = _n_persistent(spark)
    r1 = ivfpq_topk(df, queries, nlist=2, nprobe=2, m=2, k_pq=4, top_k=3, dim=8)
    r2 = ivfpq_topk(df, queries, nlist=2, nprobe=2, m=2, k_pq=4, top_k=3, dim=8)
    # two composed searches: only the two pinned result frames survive —
    # the 2x5 index artifacts (4 IVF-PQ + ADC LUT each) are all released
    assert _n_persistent(spark) - n0 <= 2
    assert r1.count() > 0 and r2.count() > 0


def test_ivfpq_scope_path_is_lazy_and_release_frees_blocks(spark):
    from aicoe_osc_demo_spark.operators.similarity import ivfpq_topk

    df = _emb_df(spark)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n0 = _n_persistent(spark)
    with CacheScope() as s:
        out = ivfpq_topk(
            df, queries, nlist=2, nprobe=2, m=2, k_pq=4, top_k=3, dim=8, scope=s
        )
        # scope path: nothing materialized at build time (plan is lazy)
        rows1 = out.collect()
        assert _n_persistent(spark) > n0  # artifacts are cached mid-scope
        rows2 = out.collect()  # second action reuses them
        assert rows1 == rows2
    # context-manager exit released every artifact (blocking unpersist);
    # <= rather than == because the async ContextCleaner may concurrently
    # GC result blocks pinned by earlier tests
    assert _n_persistent(spark) <= n0


def test_prefix_jaccard_and_pagerank_default_release(spark):
    from aicoe_osc_demo_spark.operators.dedup import prefix_jaccard_join
    from aicoe_osc_demo_spark.operators.graph import pagerank

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * (1 + i % 3))
         for i in range(12)],
        ["doc_id", "text"],
    )
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(10)], ["node_id"])
    n0 = _n_persistent(spark)
    pj = prefix_jaccard_join(docs, threshold=0.5)
    pr = pagerank(edges, nodes, iters=2)
    # one pinned result frame each; the shingle base / edge cache are gone
    assert _n_persistent(spark) - n0 <= 2
    assert pj.count() > 0 and pr.count() == 10

    with CacheScope() as s:
        lazy = prefix_jaccard_join(docs, threshold=0.5, scope=s)
        n_lazy = lazy.count()
    assert n_lazy == pj.count()
    assert _n_persistent(spark) <= n0 + 2  # scope released its persist
