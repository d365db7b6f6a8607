"""Similarity search over embedding columns (array<float>).

The reference's only similarity operators are fuzzy text joins (J4/J5,
table_curator.py:169-191); a training-data pipeline additionally needs
vector ANN.  Two tiers:

- ``cosine_topk``: brute-force cosine top-k of a SMALL query set against the
  full corpus — query side broadcast, corpus side scanned once, dot products
  evaluated JVM-side with ``zip_with``/``aggregate`` (no Python).  At 100 TB
  the corpus scan dominates and parallelizes perfectly; the window top-k
  shuffles only (query_id, score) pairs.
- ``lsh_ann_topk``: random-hyperplane LSH — deterministic planes derived from
  md5 so runs are reproducible; bucket equi-join prunes candidates, then
  exact cosine re-ranks within buckets.  Probe both the bucket and its
  single-bit-flip neighbors for recall.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine_scores(corpus: DataFrame, queries: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """All (query, corpus) cosine scores; query side must be small (broadcast)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6
            ).alias("cosine"),
        )
    )


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Brute-force exact top-k neighbors per query by cosine similarity."""
    from .relational import top_k_per_group

    scores = cosine_scores(corpus, queries, vec_col, id_col)
    return top_k_per_group(scores, ["query_id"], F.col("cosine"), k, tiebreak=["neighbor_id"])


def _planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible across
    runs/machines with no RNG state."""
    planes = []
    for j in range(n_planes):
        row = []
        for k in range(dim):
            h = hashlib.md5(f"plane:{j}:{k}".encode()).hexdigest()[:8]
            row.append(int(h, 16) / 2**32 - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(vec, planes: list[list[float]]):
    """Bucket id = sign bits of the vector against each hyperplane."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bit = F.when(_dot(vec, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: the corpus is pre-bucketed by a coarse quantizer (here
    the ``label`` column stands in for a k-means assignment — at 100 TB you
    train centroids offline and persist the assignment as a partition
    column).  Centroids are computed per bucket, each query probes its
    ``nprobe`` nearest centroids, and exact cosine runs only within the
    probed buckets.

    Scale shape: the corpus scan is pruned to nprobe/nlist of the data when
    the bucket is a partition column; centroids are a tiny broadcast.
    """
    from .relational import top_k_per_group

    # centroid per bucket: element-wise mean via posexplode + groupBy(label, pos)
    exploded = corpus.select(
        F.col(label_col).alias("bucket"), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    cent = (
        exploded.groupBy("bucket", "pos")
        .agg(F.avg("v").alias("cv"))
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("s"))
        .select("bucket", F.transform("s", lambda x: x["cv"]).alias("centroid"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    # assign each query to its nprobe nearest centroids (tiny cross: queries
    # and centroid table are both broadcast-sized)
    probe = top_k_per_group(
        q.crossJoin(F.broadcast(cent)).select(
            "query_id",
            "qv",
            "bucket",
            (_dot(F.col("qv"), F.col("centroid"))
             / (_norm(F.col("qv")) * _norm(F.col("centroid")))).alias("csim"),
        ),
        ["query_id"],
        F.col("csim"),
        nprobe,
        tiebreak=["bucket"],
    ).select("query_id", "qv", "bucket")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("bucket"),
    )
    cand = c.join(F.broadcast(probe), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6).alias(
            "cosine"
        ),
    )
    return top_k_per_group(scored, ["query_id"], F.col("cosine"), k, tiebreak=["neighbor_id"])


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector analogue of
    MinHash-LSH dedup: hyperplane-LSH bucket self-join (one side multiprobes
    its 1-bit-flip neighbor buckets for recall), exact cosine only within
    candidate buckets, keep pairs above ``threshold``.

    Scale shape: never all-pairs — candidates come from an equi-join on the
    bucket key; near-identical vectors agree on every sign bit, so recall at
    high thresholds is driven by the multiprobe radius.  The shuffle carries
    (bucket, id, vector) rows, 1+n_planes replicas on the probing side only.
    """
    from .relational import ensure_parallelism

    planes = _planes(n_planes, dim)
    base = ensure_parallelism(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    ).select("vid", "v", lsh_bucket(F.col("v"), planes).alias("b0"))
    probes = F.array_distinct(
        F.array(F.col("b0"), *[F.col("b0").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)])
    )
    left = base.withColumn("bucket", F.explode(probes)).select(
        F.col("vid").alias("d1"), F.col("v").alias("v1"), "bucket"
    )
    right = base.select(F.col("vid").alias("d2"), F.col("v").alias("v2"), F.col("b0").alias("bucket"))
    scored = (
        left.join(right, on="bucket")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            F.round(
                _dot(F.col("v1"), F.col("v2")) / (_norm(F.col("v1")) * _norm(F.col("v2"))), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()  # multiprobe replicas of the same (d1, d2) collapse here
    )
    return scored


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket equi-join (+ 1-bit-flip probe
    buckets on the query side) then exact cosine within candidates."""
    from .relational import top_k_per_group

    planes = _planes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    probe_buckets = F.array_distinct(
        F.flatten(
            F.array(
                F.array(F.col("qb")),
                F.array(*[F.col("qb").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)]),
            )
        )
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            lsh_bucket(F.col(vec_col), planes).alias("qb"),
        )
        .withColumn("bucket", F.explode(probe_buckets))
        .drop("qb")
    )
    cand = c.join(F.broadcast(q), on="bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6).alias(
            "cosine"
        ),
    )
    return top_k_per_group(scored, ["query_id"], F.col("cosine"), k, tiebreak=["neighbor_id"])
