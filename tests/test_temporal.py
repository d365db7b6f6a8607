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


def test_asof_join_null_valued_row_is_the_match(spark):
    """ASOF picks the latest right ROW at-or-before and takes its values
    AS-IS: a matched row whose value is NULL yields NULL — it must not
    fall back to an older non-null value (the r13 null-view fuzzer find),
    and multi-column values must all come from the SAME matched row."""
    trades = spark.createDataFrame([(1, "u1", 10), (2, "u1", 30)], ["trade_id", "user", "t"])
    quotes = spark.createDataFrame(
        [("u1", 5, 100.0, "a"), ("u1", 9, None, "b"), ("u1", 25, 120.0, None)],
        "user string, qt long, px double, src string",
    )
    out = asof_join(
        trades, quotes, on=["user"], left_ts="t", right_ts="qt",
        value_cols=["px", "src"],
    )
    got = {r.trade_id: (r.px_asof, r.src_asof) for r in out.collect()}
    # t=10 matches the qt=9 row: px NULL (no fallback to 100.0), src "b"
    assert got[1] == (None, "b")
    # t=30 matches qt=25: px 120.0, src NULL — both from the same row
    assert got[2] == (120.0, None)


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


def test_funnel_requires_step_order(spark):
    # click BEFORE the first view must not count as view->click
    from datetime import datetime

    import aicoe_osc_demo_spark.plans as plans
    from pyspark.sql import Window, functions as F

    rows = [
        # user 1: proper view -> click -> purchase
        (1, "view", datetime(2024, 1, 1, 10)),
        (1, "click", datetime(2024, 1, 1, 11)),
        (1, "purchase", datetime(2024, 1, 1, 12)),
        # user 2: click precedes the only view -> funnel stops at view
        (2, "click", datetime(2024, 1, 1, 9)),
        (2, "view", datetime(2024, 1, 1, 10)),
        # user 3: never views
        (3, "purchase", datetime(2024, 1, 1, 8)),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    wu = Window.partitionBy("user_id")
    d = e.withColumn("t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu))
    d = d.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(wu),
    )
    d = d.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
            )
        ).over(wu),
    )
    per_user = d.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    got = per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full"),
    ).collect()[0]
    assert (got.n_view, got.n_view_click, got.n_full) == (2, 1, 1)


def test_binned_range_join_matches_broadcast_form(spark):
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.temporal import (
        binned_range_join,
        range_join_broadcast,
    )

    facts = spark.createDataFrame([(i * 7,) for i in range(100)], "p long")
    ivs = spark.createDataFrame(
        [(0, 0, 50), (1, 50, 300), (2, 250, 700), (3, 699, 700)],
        "iv_id long, s long, e long",
    )
    got = binned_range_join(facts, ivs, "p", "s", "e", bin_width=64)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the whole point: candidates via bin equi-join, not a nested loop
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    want = range_join_broadcast(ivs, facts.select(F.col("p")), F.col("p"), F.col("s"), F.col("e"))
    assert {(r.p, r.iv_id) for r in got.collect()} == {
        (r.p, r.iv_id) for r in want.collect()
    }
    # boundary semantics: start inclusive, end exclusive
    edge = binned_range_join(
        spark.createDataFrame([(50,), (300,)], "p long"), ivs, "p", "s", "e", bin_width=64
    )
    assert {(r.p, r.iv_id) for r in edge.collect()} == {(50, 1), (300, 2)}


def test_scd2_from_changelog_semantics(spark):
    from aicoe_osc_demo_spark.operators.relational import scd2_from_changelog

    rows = [
        # user 1: a -> a (dup, must collapse) -> b -> a
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 01:00:00", "a"),
        (1, "2024-01-01 02:00:00", "b"),
        (1, "2024-01-01 03:00:00", "a"),
        # user 2: single state
        (2, "2024-01-01 00:30:00", "x"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "state"]).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    out = scd2_from_changelog(df, ["user_id"], "ts", ["state"]).collect()
    u1 = sorted(
        [(r.state, str(r.valid_from), r.valid_to and str(r.valid_to), r.is_current)
         for r in out if r.user_id == 1]
    )
    # the duplicate 'a' at 01:00 must NOT split the first interval
    assert u1 == sorted([
        ("a", "2024-01-01 00:00:00", "2024-01-01 02:00:00", False),
        ("b", "2024-01-01 02:00:00", "2024-01-01 03:00:00", False),
        ("a", "2024-01-01 03:00:00", None, True),
    ])
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current and u2[0].valid_to is None
    # intervals tile: each non-current valid_to equals the next valid_from
    # (validity is half-open, point-in-time lookups hit exactly one row)
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    for rows_u in per_user.values():
        rows_u.sort(key=lambda r: r.valid_from)
        for a, b in zip(rows_u, rows_u[1:]):
            assert a.valid_to == b.valid_from
    # open_end_ts sentinel replaces the NULL open end
    out2 = scd2_from_changelog(
        df, ["user_id"], "ts", ["state"], open_end_ts="2100-01-01 00:00:00"
    ).collect()
    assert all(r.valid_to is not None for r in out2)
    assert sum(1 for r in out2 if str(r.valid_to).startswith("2100")) == 2


def test_scd2_windows_share_one_shuffle(spark):
    # lag (collapse) and lead (validity) both partition on the key: the
    # plan must reuse one Exchange
    import contextlib
    import io

    from aicoe_osc_demo_spark.operators.relational import scd2_from_changelog

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a")], ["user_id", "ts", "state"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = scd2_from_changelog(df, ["user_id"], "ts", ["state"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    assert buf.getvalue().count("Exchange") <= 1


def test_gapfill_locf_semantics(spark):
    from aicoe_osc_demo_spark.operators.temporal import gapfill_locf

    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-01 03:00:00", 4.0),  # 01:00, 02:00 are gaps
        ("b", "2024-01-01 05:00:00", 9.0),  # single bucket: no gaps
    ]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"]).withColumn(
        "bucket", F.col("bucket").cast("timestamp_ntz")
    )
    out = gapfill_locf(df, ["k"], "bucket", ["v"], 3600).collect()
    a = sorted(
        ((str(r.bucket), r.v, r.is_gap) for r in out if r.k == "a"), key=lambda t: t[0]
    )
    assert a == [
        ("2024-01-01 00:00:00", 1.0, False),
        ("2024-01-01 01:00:00", 1.0, True),   # carried forward
        ("2024-01-01 02:00:00", 1.0, True),
        ("2024-01-01 03:00:00", 4.0, False),
    ]
    b = [(str(r.bucket), r.v, r.is_gap) for r in out if r.k == "b"]
    assert b == [("2024-01-01 05:00:00", 9.0, False)]
    # grid is dense: bucket deltas are exactly one step within each key
    import datetime

    buckets_a = [r[0] for r in a]
    for x, y in zip(buckets_a, buckets_a[1:]):
        d = datetime.datetime.fromisoformat(y) - datetime.datetime.fromisoformat(x)
        assert d.total_seconds() == 3600


def test_scd2_ltz_timestamp_input(spark):
    # the open-end sentinel must cast to the INPUT ts type: a plain
    # TIMESTAMP (ltz) changelog previously broke against the hardcoded
    # timestamp_ntz sentinel cast
    from aicoe_osc_demo_spark.operators.relational import scd2_from_changelog

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a"), (1, "2024-01-01 01:00:00", "b")],
        ["user_id", "ts", "state"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_from_changelog(
        df, ["user_id"], "ts", ["state"], open_end_ts="2100-01-01 00:00:00"
    )
    assert dict(out.dtypes)["valid_to"] == dict(df.dtypes)["ts"] == "timestamp"
    rows = out.collect()
    assert all(r.valid_to is not None for r in rows)
    assert sum(1 for r in rows if str(r.valid_to).startswith("2100")) == 1


def test_gapfill_locf_observed_null_is_not_a_gap(spark):
    # gap detection is presence-based, NOT first-value-column-based: an
    # observed bucket whose first value column is legitimately NULL keeps
    # is_gap=False; its NULL still fills via locf (locf treats NULL as
    # missing) while the OTHER value column keeps its own observation
    from aicoe_osc_demo_spark.operators.temporal import gapfill_locf

    rows = [
        ("a", "2024-01-01 00:00:00", 1.0, 10.0),
        ("a", "2024-01-01 01:00:00", None, 20.0),  # observed, v1 NULL
        ("a", "2024-01-01 03:00:00", 4.0, 40.0),   # 02:00 is the only gap
    ]
    df = spark.createDataFrame(rows, ["k", "bucket", "v1", "v2"]).withColumn(
        "bucket", F.col("bucket").cast("timestamp_ntz")
    )
    out = sorted(
        (str(r.bucket), r.v1, r.v2, r.is_gap)
        for r in gapfill_locf(df, ["k"], "bucket", ["v1", "v2"], 3600).collect()
    )
    assert out == [
        ("2024-01-01 00:00:00", 1.0, 10.0, False),
        ("2024-01-01 01:00:00", 1.0, 20.0, False),  # observed: not a gap
        ("2024-01-01 02:00:00", 1.0, 20.0, True),
        ("2024-01-01 03:00:00", 4.0, 40.0, False),
    ]


def test_time_weighted_avg_locf_hand_computed(spark):
    from aicoe_osc_demo_spark.operators.temporal import time_weighted_avg

    # user u: v=10 for 10s, v=20 for 30s, trailing v=99 carries no weight
    # -> twa = (10*10 + 20*30) / 40 = 17.5
    rows = [
        ("u", 0, 10.0),
        ("u", 10, 20.0),
        ("u", 40, 99.0),
        ("v", 0, 5.0),        # single reading: zero covered time -> excluded
        ("w", 7, 1.0),
        ("w", 7, 2.0),        # same-instant pair: dt=0 -> excluded
    ]
    df = spark.createDataFrame(rows, ["u", "s", "val"])
    got = {r["u"]: r for r in time_weighted_avg(df, "s", "val", ["u"]).collect()}
    assert set(got) == {"u"}
    assert got["u"]["total_s"] == 40 and got["u"]["twa"] == 17.5


def test_time_weighted_avg_overflow_raises_not_clamps(spark):
    # value 1e3 over a ~107-day gap in epoch seconds: value*dt*1e9 passes
    # the long range; the non-ANSI cast would silently clamp, so the
    # operator must raise instead of returning a wrong average
    import pytest

    from aicoe_osc_demo_spark.operators.temporal import time_weighted_avg

    rows = [("u", 0, 1e3), ("u", 107 * 86400, 1e3)]
    df = spark.createDataFrame(rows, ["u", "s", "val"])
    with pytest.raises(Exception, match="overflows the nano-long"):
        time_weighted_avg(df, "s", "val", ["u"]).collect()

    # just inside the envelope still computes exactly (twa = constant)
    ok = spark.createDataFrame([("u", 0, 1e3), ("u", 86400, 1e3)], ["u", "s", "val"])
    got = time_weighted_avg(ok, "s", "val", ["u"]).collect()[0]
    assert got["twa"] == 1000.0


def test_transition_matrix_hand_computed(spark):
    from aicoe_osc_demo_spark.operators.temporal import transition_matrix

    rows = [
        ("u", 1, "a"), ("u", 2, "b"), ("u", 3, "a"), ("u", 4, "c"),
        ("v", 1, "a"), ("v", 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["user", "t", "ev"])
    got = {(r["state"], r["next_state"]): r for r in transition_matrix(df, "user", "ev", "t").collect()}
    # transitions: u: a->b, b->a, a->c; v: a->b  => from a: b=2, c=1; from b: a=1
    assert got[("a", "b")]["n"] == 2 and got[("a", "b")]["n_from"] == 3
    assert got[("a", "b")]["p"] == round(2 / 3, 6)
    assert got[("a", "c")]["p"] == round(1 / 3, 6)
    assert got[("b", "a")]["p"] == 1.0
    # last event of each entity emits no transition
    assert ("c", "a") not in got


def test_decayed_counts_half_life_math(spark):
    from aicoe_osc_demo_spark.operators.temporal import decayed_counts

    # ages 0, 7, 14 with half_life 7 -> weights 1, 0.5, 0.25
    rows = [("a", 0), ("a", 7), ("a", 14), ("b", 0)]
    df = spark.createDataFrame(rows, ["g", "age"])
    got = {r["g"]: r for r in decayed_counts(df, "age", ["g"], half_life=7.0).collect()}
    assert got["a"]["n_raw"] == 3 and got["a"]["decayed_count"] == 1.75
    assert got["b"]["decayed_count"] == 1.0
