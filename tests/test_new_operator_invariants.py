"""Invariant sweeps for the late-r6 operator batch: seeded random inputs,
algebraic postconditions.  Complements the hand-computed unit tests the
way the CDC randomized sweep complements test_apply_cdc_* — the invariants
hold for EVERY input, so a seeded fuzz over a few hundred rows probes the
corner cases the hand fixtures miss (empty groups, ties, extreme weights).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _docs(spark, seed=7, n=300):
    rng = random.Random(seed)
    rows = [
        (
            i,
            "g%d" % rng.randint(0, 4),
            float(rng.randint(1, 1000)) / (10 ** rng.randint(0, 2)),
            rng.randint(0, 500),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "grp", "val", "age"])


def test_transition_matrix_rows_normalize(spark):
    from aicoe_osc_demo_spark.operators.temporal import transition_matrix

    rng = random.Random(11)
    rows = [
        (rng.randint(0, 20), t, "s%d" % rng.randint(0, 3))
        for t in range(400)
    ]
    df = spark.createDataFrame(rows, ["ent", "t", "state"])
    out = transition_matrix(df, "ent", "state", "t").collect()
    by_state: dict[str, list] = {}
    for r in out:
        by_state.setdefault(r["state"], []).append(r)
    for state, grp in by_state.items():
        n_from = grp[0]["n_from"]
        assert all(r["n_from"] == n_from for r in grp)
        assert sum(r["n"] for r in grp) == n_from
        assert abs(sum(r["p"] for r in grp) - 1.0) < 1e-4 * len(grp)
        assert all(0 < r["p"] <= 1 for r in grp)


def test_decayed_counts_bounded_by_raw(spark):
    from aicoe_osc_demo_spark.operators.temporal import decayed_counts

    df = _docs(spark)
    for r in decayed_counts(df, "age", ["grp"], half_life=30.0).collect():
        assert 0 < r["decayed_count"] <= r["n_raw"] + 1e-6


def test_time_weighted_avg_within_value_envelope(spark):
    from aicoe_osc_demo_spark.operators.temporal import time_weighted_avg

    rng = random.Random(13)
    rows = [
        ("e%d" % rng.randint(0, 30), rng.randint(0, 10_000), float(rng.randint(-50, 50)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["ent", "s", "v"]).dropDuplicates(["ent", "s"])
    env = {
        r["ent"]: r
        for r in df.groupBy("ent").agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
    }
    for r in time_weighted_avg(df, "s", "v", ["ent"]).collect():
        assert env[r["ent"]]["lo"] - 1e-6 <= r["twa"] <= env[r["ent"]]["hi"] + 1e-6
        assert r["total_s"] > 0


def test_rater_agreement_self_is_one_and_ratios_bounded(spark):
    from aicoe_osc_demo_spark.operators.quality import rater_agreement

    df = _docs(spark, seed=17)
    out = rater_agreement(
        df,
        {
            "a": F.col("val") > 20,
            "b": F.col("age") > 250,
            "a2": F.col("val") > 20,  # duplicate of a
        },
    ).collect()
    got = {(r["rater_a"], r["rater_b"]): r for r in out}
    assert got[("a", "a2")]["kappa"] == 1.0
    for r in out:
        assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0
        assert r["kappa"] <= 1.0 + 1e-9


def test_cooccurrence_lift_count_bounds(spark):
    from aicoe_osc_demo_spark.operators.relational import cooccurrence_lift

    rng = random.Random(19)
    rows = [
        ("u%d" % rng.randint(0, 40), "i%d" % rng.randint(0, 6)) for _ in range(600)
    ]
    df = spark.createDataFrame(rows, ["ent", "item"])
    for r in cooccurrence_lift(df, "ent", "item").collect():
        assert r["item_a"] < r["item_b"]
        assert 1 <= r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0


def test_winsorize_output_stays_in_band(spark):
    from aicoe_osc_demo_spark.operators.quality import winsorize

    df = _docs(spark, seed=23)
    out = winsorize(df, "val", ["grp"], lo=0.1, hi=0.9).collect()
    for r in out:
        assert r["p_lo"] - 1e-9 <= r["val_win"] <= r["p_hi"] + 1e-9
        if r["clip_flag"] == 0:
            assert r["val_win"] == r["val"]
        else:
            assert r["val_win"] in (r["p_lo"], r["p_hi"])


def test_weighted_sample_ranks_dense_per_stratum(spark):
    from aicoe_osc_demo_spark.operators.quality import weighted_sample_topk

    df = _docs(spark, seed=29)
    out = weighted_sample_topk(df, F.col("val"), k=7, strata_cols=["grp"], id_col="id")
    by_grp: dict[str, list] = {}
    for r in out.collect():
        by_grp.setdefault(r["grp"], []).append(r)
    for grp, rows in by_grp.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1)) and len(rows) <= 7
        assert all(r["weight"] > 0 for r in rows)


def test_ngram_novelty_fraction_bounds(spark):
    from aicoe_osc_demo_spark.operators.dedup import ngram_novelty

    rng = random.Random(31)
    vocab = ["w%d" % i for i in range(15)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = docs.filter(F.col("doc_id") % 4 == 0)
    for r in ngram_novelty(docs, ref, n=3).collect():
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert abs(r["novelty_pct"] - round(100.0 * r["n_novel"] / r["n_grams"], 6)) < 1e-9
        if r["doc_id"] % 4 == 0:
            assert r["n_novel"] == 0  # reference docs are never novel vs themselves


def test_fs_link_scores_weight_envelope(spark):
    import math

    from aicoe_osc_demo_spark.operators.fuzzy import fs_link_scores

    rng = random.Random(37)
    left = spark.createDataFrame(
        [(i, "b%d" % (i % 3), "n%d" % rng.randint(0, 9), "p%d" % rng.randint(0, 9))
         for i in range(80)],
        ["l_id", "blk", "l_n", "l_p"],
    )
    right = spark.createDataFrame(
        [(1000 + i, "b%d" % (i % 3), "n%d" % rng.randint(0, 9), "p%d" % rng.randint(0, 9))
         for i in range(80)],
        ["r_id", "blk", "r_n", "r_p"],
    )
    comps = [
        ("n", F.col("l_n") == F.col("r_n"), 0.9, 0.1),
        ("p", F.col("l_p") == F.col("r_p"), 0.8, 0.1),
    ]
    max_w = sum(math.log2(m / u) for _, _, m, u in comps)
    out = fs_link_scores(left, right, ["blk"], comps, lower_bits=-100.0, upper_bits=4.0)
    for r in out.collect():
        assert r["weight"] <= max_w + 1e-6
        assert r["match_class"] in ("match", "possible")
        if r["match_class"] == "match":
            assert r["weight"] >= 4.0 - 1e-6
