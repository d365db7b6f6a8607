from __future__ import annotations

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.operators.relational import (
    dedup_keep_first,
    deterministic_sample,
    melt,
    skip_processed,
    top_k_per_group,
    train_dev_split,
)


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        ["g", "id", "score"],
    )
    out = top_k_per_group(df, ["g"], F.col("score"), 2, tiebreak=["id"])
    rows = {(r.g, r.id) for r in out.collect()}
    assert rows == {("a", 2), ("a", 3), ("b", 4)}


def test_top_k_tiebreak_deterministic(spark):
    df = spark.createDataFrame([("a", i, 1.0) for i in range(10)], ["g", "id", "score"])
    out = top_k_per_group(df, ["g"], F.col("score"), 3, tiebreak=["id"])
    assert sorted(r.id for r in out.collect()) == [0, 1, 2]


def test_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [("k1", 2, "b"), ("k1", 1, "a"), ("k2", 5, "c")], ["k", "ord", "v"]
    )
    out = dedup_keep_first(df, subset=["k"], order_by=["ord"])
    assert {(r.k, r.v) for r in out.collect()} == {("k1", "a"), ("k2", "c")}


def test_melt(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], ["id", "x", "y"])
    out = melt(df, ["id"], ["x", "y"], "var", "val").collect()
    assert {(r.var, r.val) for r in out} == {("x", 10.0), ("y", 20.0)}


def test_train_dev_split_deterministic_and_disjoint(spark):
    df = spark.range(1000)
    t1, d1 = train_dev_split(df, F.col("id"), 0.8)
    t2, d2 = train_dev_split(df.repartition(7), F.col("id"), 0.8)
    ids_t1 = {r.id for r in t1.collect()}
    ids_d1 = {r.id for r in d1.collect()}
    # stable under repartitioning
    assert ids_t1 == {r.id for r in t2.collect()}
    # disjoint and complete
    assert ids_t1.isdisjoint(ids_d1)
    assert len(ids_t1) + len(ids_d1) == 1000
    # roughly 80/20
    assert 0.75 < len(ids_t1) / 1000 < 0.85


def test_deterministic_sample_stable(spark):
    df = spark.range(500)
    s1 = [r.id for r in deterministic_sample(df, ["id"], 50).collect()]
    s2 = [r.id for r in deterministic_sample(df.repartition(13), ["id"], 50).collect()]
    assert s1 == s2
    assert len(s1) == 50


def test_skip_processed(spark):
    all_files = spark.createDataFrame([(f"f{i}",) for i in range(10)], ["name"])
    done = spark.createDataFrame([("f0",), ("f5",)], ["name"])
    out = {r.name for r in skip_processed(all_files, done, ["name"]).collect()}
    assert out == {f"f{i}" for i in range(10)} - {"f0", "f5"}


def test_upsert_latest_wins_and_ties_prefer_updates(spark):
    from aicoe_osc_demo_spark.operators.relational import upsert_latest

    existing = spark.createDataFrame(
        [(1, "old-a", 1), (2, "old-b", 5), (3, "old-c", 2)], "k long, v string, version long"
    )
    updates = spark.createDataFrame(
        [(1, "new-a", 2), (2, "stale-b", 3), (4, "new-d", 1), (3, "tie-c", 2)],
        "k long, v string, version long",
    )
    got = {r.k: r.v for r in upsert_latest(existing, updates, ["k"], "version").collect()}
    assert got == {
        1: "new-a",  # higher version wins
        2: "old-b",  # stale update loses to newer existing row
        3: "tie-c",  # version tie -> update wins
        4: "new-d",  # brand-new key inserted
    }


def test_apply_cdc_deletes_updates_and_tiebreaks(spark):
    from datetime import datetime

    from aicoe_osc_demo_spark.operators.relational import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "val"]
    )
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    log = spark.createDataFrame(
        [
            (1, "a2", "U", t0),   # update k=1
            (2, "b2", "U", t0),   # update then delete k=2
            (2, "b2", "D", t1),
            (3, "c2", "D", t0),   # delete then re-insert k=3
            (3, "c3", "U", t1),
            (5, "e", "U", t0),    # insert of a key absent from the snapshot
        ],
        ["k", "val", "op", "ts"],
    )
    got = {r["k"]: r["val"] for r in apply_cdc(snap, log, ["k"], "ts").collect()}
    # k=4 untouched from snapshot; k=2 gone; k=3 resurrected by later U
    assert got == {1: "a2", 3: "c3", 4: "d", 5: "e"}

    # equal-ts U+D on one key: default tiebreak (op desc) keeps the update
    log2 = spark.createDataFrame(
        [(1, "x", "U", t0), (1, "y", "D", t0)], ["k", "val", "op", "ts"]
    )
    got2 = {r["k"]: r["val"] for r in apply_cdc(snap, log2, ["k"], "ts").collect()}
    assert got2[1] == "x"
    # ...and an explicit tiebreak column can flip the resolution
    log3 = spark.createDataFrame(
        [(1, "x", "U", t0, 1), (1, "y", "D", t0, 2)], ["k", "val", "op", "ts", "seq"]
    )
    snap3 = snap  # seq column only exists in the changelog
    import pyspark.sql.functions as F

    got3 = apply_cdc(
        snap3.withColumn("seq", F.lit(0)), log3, ["k"], "ts", tiebreak_cols=["seq"]
    )
    assert 1 not in {r["k"] for r in got3.collect()}


def test_merge_agg_state_equals_recompute_and_handles_retractions(spark):
    import pyspark.sql.functions as F

    from aicoe_osc_demo_spark.operators.relational import merge_agg_state

    rows = [(i, "g%d" % (i % 3), i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])

    def partial(d):
        return d.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )

    state = partial(df.filter(F.col("id") < 20))
    delta = partial(df.filter(F.col("id") >= 20))
    merged = {
        r["g"]: (r["n"], r["total"])
        for r in merge_agg_state(state, delta, ["g"], ["n", "total"]).collect()
    }
    full = {r["g"]: (r["n"], r["total"]) for r in partial(df).collect()}
    assert merged == full

    # retraction: a CDC delete arrives as a negative partial
    retract = spark.createDataFrame([("g0", -1, -0)], ["g", "n", "total"])
    after = {
        r["g"]: (r["n"], r["total"])
        for r in merge_agg_state(partial(df), retract, ["g"], ["n", "total"]).collect()
    }
    assert after["g0"] == (full["g0"][0] - 1, full["g0"][1])


def test_analyze_column_stats_counts(spark):
    from aicoe_osc_demo_spark.operators.layout import analyze_column_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")], ["x", "s"]
    )
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in analyze_column_stats(df, ["x", "s"]).collect()
    }
    assert got == {"x": (4, 1, 3), "s": (4, 1, 2)}


def test_apply_cdc_randomized_against_python_mirror(spark):
    # seeded random changelogs vs an independent per-key replay mirror —
    # covers multi-change keys, delete-then-reinsert, snapshot fallback,
    # and changelog-only keys in one sweep
    import random
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F  # noqa: F401

    from aicoe_osc_demo_spark.operators.relational import apply_cdc

    rnd = random.Random(97)
    base = datetime(2024, 1, 1)
    for trial in range(3):
        snap_keys = list(range(8))
        snap = [(k, f"s{k}") for k in snap_keys]
        log = []
        for _ in range(40):
            k = rnd.randrange(12)  # keys 8-11 exist only in the changelog
            ts = base + timedelta(minutes=rnd.randrange(500))
            op = "D" if rnd.random() < 0.3 else "U"
            log.append((k, f"v{rnd.randrange(1000)}", op, ts))
        # mirror: latest change per key wins; full (ts, op, val) ordering so
        # even equal-ts equal-op collisions resolve identically (the engine
        # gets the same total order via explicit tiebreak_cols)
        final: dict[int, str | None] = {k: v for k, v in snap}
        best: dict[int, tuple] = {}
        for k, v, op, ts in log:
            cand = (ts, op, v)
            if k not in best or cand > best[k]:
                best[k] = cand
        for k, (_ts, op, v) in best.items():
            final[k] = None if op == "D" else v
        expected = {k: v for k, v in final.items() if v is not None}

        got = {
            r["k"]: r["val"]
            for r in apply_cdc(
                spark.createDataFrame(snap, ["k", "val"]),
                spark.createDataFrame(log, ["k", "val", "op", "ts"]),
                ["k"],
                "ts",
                tiebreak_cols=["op", "val"],
            ).collect()
        }
        assert got == expected, f"trial {trial}"


def test_table_diff_classification_and_null_safety(spark):
    from aicoe_osc_demo_spark.operators.relational import table_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y"), (4, None, "z")],
        ["k", "v1", "v2"],
    )
    new = spark.createDataFrame(
        [(1, "a", None), (2, "B", "x"), (5, "e", "w"), (4, "null", "z")],
        ["k", "v1", "v2"],
    )
    got = {r["status"]: r["n_keys"] for r in table_diff(old, new, ["k"]).collect()}
    # k=1 unchanged (incl. NULL column), k=2 changed, k=3 removed, k=5
    # added — and k=4 is CHANGED, not unchanged: a NULL value and the
    # string 'null' must not collide in the fingerprint
    assert got == {"unchanged": 1, "changed": 2, "removed": 1, "added": 1}


def test_column_histograms_bins_and_bounds(spark):
    from aicoe_osc_demo_spark.operators.layout import column_histograms

    rows = [(float(v), 5) for v in range(0, 100)]  # x uniform 0..99, y constant
    df = spark.createDataFrame(rows, ["x", "y"])
    out = column_histograms(df, ["x", "y"], bins=10).collect()
    xs = sorted((r for r in out if r["column"] == "x"), key=lambda r: r["bin"])
    # uniform 0..99 with width 9.9: bin 9 absorbs the max via least()
    assert [r["bin"] for r in xs] == list(range(10))
    assert sum(r["n"] for r in xs) == 100
    assert xs[0]["lo"] == 0.0 and xs[9]["hi"] == 99.0
    # constant column collapses to one bin holding everything
    ys = [r for r in out if r["column"] == "y"]
    assert len(ys) == 1 and ys[0]["bin"] == 0 and ys[0]["n"] == 100


def test_percentile_bins_equi_depth_and_tie_stable(spark):
    from aicoe_osc_demo_spark.operators.relational import percentile_bins

    # 100 distinct values per group -> quartiles cut 25/25/25/25
    rows = [("a", float(v)) for v in range(100)] + [("b", float(v * 3)) for v in range(100)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = percentile_bins(df, ["g"], "x", n_bins=4)
    counts = {
        (r["g"], r["bin"]): r["n"]
        for r in out.groupBy("g", "bin").count().withColumnRenamed("count", "n").collect()
    }
    for g in ("a", "b"):
        assert sum(counts[(g, b)] for b in range(4)) == 100
        assert all(abs(counts[(g, b)] - 25) <= 1 for b in range(4))
    # bins are monotone in the value: per-bin max < next bin's min
    envl = sorted(
        out.filter(F.col("g") == "a").groupBy("bin").agg(
            F.min("x").alias("lo"), F.max("x").alias("hi")
        ).collect(),
        key=lambda r: r["bin"],
    )
    for prev, nxt in zip(envl, envl[1:]):
        assert prev["hi"] < nxt["lo"]

    # tie stability: a value equal to a cutpoint never splits across bins
    ties = spark.createDataFrame([("t", 1.0)] * 50 + [("t", 2.0)] * 50, ["g", "x"])
    tout = percentile_bins(ties, ["g"], "x", n_bins=4)
    per_value_bins = (
        tout.groupBy("x").agg(F.countDistinct("bin").alias("nb")).collect()
    )
    assert all(r["nb"] == 1 for r in per_value_bins)

    import pytest

    with pytest.raises(ValueError):
        percentile_bins(df, ["g"], "x", n_bins=1)


def test_percentile_bins_plan_broadcasts_cuts(spark):
    from aicoe_osc_demo_spark.operators.relational import percentile_bins

    df = spark.createDataFrame([("a", float(v)) for v in range(50)], ["g", "x"])
    plan = percentile_bins(df, ["g"], "x", n_bins=10)._jdf.queryExecution().executedPlan().toString()
    # the cut table joins back broadcast (map-side assignment) and the
    # whole operator contains NO sort -- the point vs NTILE
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Sort" not in plan


def test_percentile_bins_approx_switch_matches_exact_at_tolerance(spark):
    # approx=True swaps the cut aggregate to approx_percentile; with a
    # tight accuracy on a moderate group the assignment is identical for
    # every row not sitting exactly on a cutpoint
    from aicoe_osc_demo_spark.operators.relational import percentile_bins

    rows = [("g", float(i)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    exact = {
        r["v"]: r["bin"]
        for r in percentile_bins(df, ["grp"], "v", n_bins=4).collect()
    }
    approx = {
        r["v"]: r["bin"]
        for r in percentile_bins(
            df, ["grp"], "v", n_bins=4, approx=True, accuracy=100000
        ).collect()
    }
    assert set(exact) == set(approx)
    diffs = [v for v in exact if exact[v] != approx[v]]
    # only rows adjacent to a cutpoint may shift by the rank tolerance
    assert len(diffs) <= 4 and all(abs(exact[v] - approx[v]) <= 1 for v in diffs)


def test_merge_join_state_equals_full_recompute(spark):
    # Δ-rule maintenance: M ∪ (ΔA⋈B) ∪ (A⋈ΔB) ∪ (ΔA⋈ΔB) == (A∪ΔA)⋈(B∪ΔB),
    # including keys where both deltas land (the ΔA⋈ΔB term)
    from aicoe_osc_demo_spark.operators.relational import merge_join_state

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "av"])
    d_a = spark.createDataFrame([(2, "a2new"), (3, "a3")], ["k", "av"])
    b_old = spark.createDataFrame([(1, "b1"), (3, "b3")], ["k", "bv"])
    d_b = spark.createDataFrame([(2, "b2"), (3, "b3new")], ["k", "bv"])
    m_old = a_old.join(b_old, ["k"])
    got = merge_join_state(m_old, a_old, b_old, d_a, d_b, ["k"])
    want = a_old.unionByName(d_a).join(b_old.unionByName(d_b), ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_lag_features_hand_computed(spark):
    from aicoe_osc_demo_spark.operators.temporal import lag_features

    rows = [
        ("u", 10, "a", 1.0),
        ("u", 25, "b", 4.5),
        ("u", 25, "c", 2.0),   # tie on ts -> tiebreak on state col value? use id
        ("v", 5, "x", 7.0),
    ]
    df = spark.createDataFrame(rows, ["u", "s", "ev", "val"])
    out = {
        (r["u"], r["seq"]): r
        for r in lag_features(
            df, "u", "s", "val", state_col="ev", tiebreak_cols=["ev"]
        ).collect()
    }
    assert out[("u", 1)]["prev_state"] is None
    assert out[("u", 1)]["gap_s"] is None and out[("u", 1)]["value_delta"] is None
    assert out[("u", 2)]["prev_state"] == "a" and out[("u", 2)]["gap_s"] == 15
    assert out[("u", 2)]["value_delta"] == 3.5
    assert out[("u", 3)]["prev_state"] == "b" and out[("u", 3)]["gap_s"] == 0
    assert out[("u", 3)]["value_delta"] == -2.5
    assert out[("v", 1)]["prev_state"] is None and len(out) == 4


def test_merge_join_state_random_multisets(spark):
    # seeded multiset stress for the Δ-rule: duplicate keys on every side
    # (join multiplicities multiply), keys present only in deltas, keys
    # with no match at all — maintained view must equal full recompute
    import random

    from aicoe_osc_demo_spark.operators.relational import merge_join_state

    rnd = random.Random(7)

    def tbl(n, tag):
        return [(rnd.randint(0, 5), f"{tag}{i}") for i in range(n)]

    a_old = spark.createDataFrame(tbl(15, "a"), ["k", "av"])
    d_a = spark.createDataFrame(tbl(8, "A"), ["k", "av"])
    b_old = spark.createDataFrame(tbl(12, "b"), ["k", "bv"])
    d_b = spark.createDataFrame(tbl(6, "B"), ["k", "bv"])
    got = merge_join_state(
        a_old.join(b_old, ["k"]), a_old, b_old, d_a, d_b, ["k"]
    ).collect()
    want = a_old.unionByName(d_a).join(b_old.unionByName(d_b), ["k"]).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
