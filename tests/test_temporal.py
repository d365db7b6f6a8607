from __future__ import annotations

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.operators.temporal import asof_join, range_join_broadcast


def test_asof_join_semantics(spark):
    trades = spark.createDataFrame(
        [(1, "u1", 10), (2, "u1", 25), (3, "u1", 9), (5, "u1", 5), (4, "u2", 50)],
        ["trade_id", "user", "t"],
    )
    quotes = spark.createDataFrame(
        [("u1", 8, 100.0), ("u1", 10, 110.0), ("u1", 20, 120.0)],
        ["user", "t", "px"],
    )
    out = asof_join(
        trades, quotes.withColumnRenamed("t", "qt"),
        on=["user"], left_ts="t", right_ts="qt", value_cols=["px"],
    )
    got = {r.trade_id: r.px_asof for r in out.collect()}
    assert got[1] == 110.0   # tie at t=10 → at-or-before includes it
    assert got[2] == 120.0   # latest prior quote
    assert got[3] == 100.0   # between quotes → earlier one
    assert got[5] is None    # before the first quote → null
    assert got[4] is None    # no quotes for u2 → left join null


def test_asof_join_no_cartesian(spark):
    left = spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("t"))
    right = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").alias("rt"), (F.col("id") * 2.0).alias("v")
    )
    out = asof_join(left, right, ["k"], "t", "rt", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert out.count() == 100


def test_range_join_broadcast(spark):
    facts = spark.createDataFrame([(1, 5), (2, 15), (3, 25)], ["id", "x"])
    intervals = spark.createDataFrame(
        [("low", 0, 10), ("mid", 10, 20)], ["bucket", "s", "e"]
    )
    out = range_join_broadcast(facts, intervals, F.col("x"), F.col("s"), F.col("e"))
    got = {r.id: r.bucket for r in out.collect()}
    assert got == {1: "low", 2: "mid"}  # 25 matches nothing
