from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.operators.similarity import cosine_topk, ivf_topk
from aicoe_osc_demo_spark.operators.skew import salted_join
from aicoe_osc_demo_spark.streaming.stateful import running_user_counts


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(200)], ["id", "k", "v"]
    )
    dim = spark.createDataFrame([("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(0, 200, 10)],
                                ["k", "attr"])
    plain = {(r.id, r.attr) for r in fact.join(dim, "k").collect()}
    salted = {(r.id, r.attr) for r in salted_join(fact, dim, "k", n_salts=4).collect()}
    assert salted == plain


def _emb(spark):
    rnd = random.Random(11)
    rows = []
    for i in range(60):
        label = i % 4
        # cluster structure: vectors near their label's direction
        base = [1.0 if d == label else 0.0 for d in range(8)]
        rows.append((i, [b + rnd.uniform(-0.2, 0.2) for b in base], label))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_ivf_topk_recall_and_plan(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 3)
    ivf = ivf_topk(emb, queries, k=3, nprobe=2)
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    exact = cosine_topk(emb, queries, k=3)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ivf_pairs = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    # clustered data: probing the 2 nearest of 4 centroids recovers most
    # true neighbors
    assert len(ivf_pairs & exact_pairs) >= len(exact_pairs) * 2 // 3


def test_running_user_counts_batch_equivalence(spark):
    e = spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 5.0)], ["user_id", "value"]
    )
    out = {r.user_id: r for r in running_user_counts(e).collect()}
    assert out[1].total_events == 2 and out[1].total_value == 5.0
    assert out[2].total_events == 1


def test_running_user_counts_stateful_stream(spark, tmp_path):
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(inp)
    spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 5.0)], ["user_id", "value"]).coalesce(
        1
    ).write.parquet(inp + "/f1.parquet")

    def run(sink: list):
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("recursiveFileLookup", "true")
            .parquet(inp)
        )

        def collect_batch(df, epoch_id):
            sink.extend(df.collect())

        q = (
            running_user_counts(stream)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    out1: list = []
    run(out1)
    first = {r.user_id: r for r in out1}
    assert first[1].total_events == 2 and first[2].total_value == 5.0

    # state survives into the next incremental run through the checkpoint
    spark.createDataFrame([(1, 10.0)], ["user_id", "value"]).coalesce(1).write.parquet(
        inp + "/f2.parquet"
    )
    out2: list = []
    run(out2)
    second = {r.user_id: r for r in out2}
    assert second[1].total_events == 3 and second[1].total_value == 15.0
