from __future__ import annotations

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.operators.sketch import _misra_gries, heavy_hitters


def test_misra_gries_guarantee():
    # any item with frequency > n/capacity survives
    stream = ["hot"] * 50 + [f"cold{i}" for i in range(100)]
    counters = _misra_gries(stream, capacity=8)
    assert "hot" in counters
    assert len(counters) <= 8  # bounded memory


def test_heavy_hitters_matches_exact_topk(spark):
    rows = [("a",)] * 100 + [("b",)] * 60 + [("c",)] * 30 + [(f"x{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["w"]).repartition(8)
    out = heavy_hitters(df, "w", k=3, capacity=64).collect()
    assert [(r.item, r.n) for r in out] == [("a", 100), ("b", 60), ("c", 30)]


def test_heavy_hitters_bounded_candidates(spark):
    # vocabulary far larger than capacity: result still exact for the heavy
    # head because every partial keeps at most `capacity` counters
    rows = [("hh",)] * 500 + [(f"t{i % 1000}",) for i in range(3000)]
    df = spark.createDataFrame(rows, ["w"]).repartition(4)
    out = heavy_hitters(df, "w", k=1, capacity=128).collect()
    assert out[0].item == "hh" and out[0].n == 500


def test_bloom_no_false_negatives_bounded_fp(spark):
    from aicoe_osc_demo_spark.operators.sketch import bloom_build_bits, bloom_probe

    led = spark.createDataFrame([(f"member{i}",) for i in range(120)], "key string")
    bits = bloom_build_bits(led)
    # words table is tiny and broadcastable: at most m/32 rows
    assert bits.count() <= 32
    probe = spark.createDataFrame(
        [(f"member{i}",) for i in range(100, 120)]
        + [(f"absent{i}",) for i in range(200)],
        "key string",
    )
    res = {r.key: r.maybe_member for r in bloom_probe(probe, bits).collect()}
    # every true member flagged (no false negatives)
    assert all(res[f"member{i}"] for i in range(100, 120))
    # false-positive rate stays well under half at this load factor
    fps = sum(res[f"absent{i}"] for i in range(200))
    assert fps / 200 < 0.5


def test_hll_estimate_within_standard_error(spark):
    from aicoe_osc_demo_spark.operators.sketch import hll_estimate, hll_sketch

    n = 20_000
    items = spark.range(n).select(F.concat(F.lit("item"), F.col("id")).alias("w"))
    sk = hll_sketch(items, "w")
    assert sk.count() <= 1024  # bounded state regardless of cardinality
    est = hll_estimate(sk).first()
    # standard error at 1024 buckets is 3.25%; allow 4 sigma
    assert abs(est.estimate - n) / n < 0.13
    assert est.harmonic_numerator > 0


def test_hll_partitioning_invariant(spark):
    # max-combine is order/partitioning independent -> identical sketch
    from aicoe_osc_demo_spark.operators.sketch import hll_estimate, hll_sketch

    items = spark.range(5000).select(F.concat(F.lit("x"), F.col("id")).alias("w"))
    e1 = hll_estimate(hll_sketch(items.repartition(1), "w")).first()
    e8 = hll_estimate(hll_sketch(items.repartition(8), "w")).first()
    assert e1 == e8


def test_bloom_sizing_parameters_control_fp_rate(spark):
    # the deploy-scale path: m_bits sized ~10x the ledger keeps the FP rate
    # low where the small oracle-checked default would saturate to all-ones
    from aicoe_osc_demo_spark.operators.sketch import bloom_build_bits, bloom_probe

    led = spark.createDataFrame([(f"member{i}",) for i in range(2000)], "key string")
    probe = spark.createDataFrame(
        [(f"member{i}",) for i in range(0, 2000, 40)]
        + [(f"absent{i}",) for i in range(400)],
        "key string",
    )
    # default 1024 bits: saturated — everything "maybe", still no false negatives
    small = {r.key: r.maybe_member for r in bloom_probe(probe, bloom_build_bits(led)).collect()}
    assert all(small[f"member{i}"] for i in range(0, 2000, 40))
    # sized filter: 10 bits/key -> FP rate ~1%
    m = 20_480
    bits = bloom_build_bits(led, m_bits=m, k=4)
    assert bits.count() <= m // 32
    sized = {
        r.key: r.maybe_member
        for r in bloom_probe(probe, bits, m_bits=m, k=4).collect()
    }
    assert all(sized[f"member{i}"] for i in range(0, 2000, 40))
    fps = sum(sized[f"absent{i}"] for i in range(400))
    assert fps / 400 < 0.1


def test_cms_upper_bound_and_exactness_without_collisions(spark):
    from aicoe_osc_demo_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [("hot",)] * 40 + [("warm",)] * 7 + [(f"cold{i}",) for i in range(30)]
    items = spark.createDataFrame(rows, "w string").repartition(4)
    sk = cms_sketch(items, "w")
    assert sk.count() <= 4 * 1024  # bounded counter table
    probes = spark.createDataFrame([("hot",), ("warm",), ("cold3",), ("absent",)], "w string")
    est = {r.w: r.est for r in cms_estimate(sk, probes, "w").collect()}
    # upper-bound guarantee, and exact at this tiny load (no collisions)
    assert est["hot"] == 40 and est["warm"] == 7 and est["cold3"] == 1
    assert est["absent"] == 0  # all-zero buckets or min over empty -> 0


def test_cms_partitioning_invariant(spark):
    from aicoe_osc_demo_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [(f"t{i % 50}",) for i in range(500)]
    probes = spark.createDataFrame([("t0",), ("t7",)], "w string")
    items = spark.createDataFrame(rows, "w string")
    e1 = sorted(cms_estimate(cms_sketch(items.repartition(1), "w"), probes, "w").collect())
    e8 = sorted(cms_estimate(cms_sketch(items.repartition(8), "w"), probes, "w").collect())
    assert e1 == e8


def test_hll_grouped_estimates_per_key(spark):
    from aicoe_osc_demo_spark.operators.sketch import hll_estimate, hll_sketch

    rows = [("a", f"u{i}") for i in range(3000)] + [("b", f"u{i}") for i in range(300)]
    items = spark.createDataFrame(rows, "grp string, uid string")
    est = {
        r.grp: r.estimate
        for r in hll_estimate(hll_sketch(items, "uid", ["grp"]), ["grp"]).collect()
    }
    assert abs(est["a"] - 3000) / 3000 < 0.15
    assert abs(est["b"] - 300) / 300 < 0.15


def test_quantile_sketch_accuracy_and_mergeability(spark):
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.sketch import quantile_estimate, quantile_sketch

    import random

    rnd = random.Random(3)
    vals = [rnd.uniform(0, 1000) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    lo, hi, bins = 0.0, 1000.0, 200
    est = {
        r.q: r.estimate
        for r in quantile_estimate(
            quantile_sketch(df, "v", lo, hi, bins), [0.1, 0.5, 0.9], lo, hi, bins
        ).collect()
    }
    width = (hi - lo) / bins
    exact = sorted(vals)
    for q in (0.1, 0.5, 0.9):
        true_q = exact[int(q * len(vals)) - 1]
        assert abs(est[q] - true_q) <= 2 * width  # equi-width histogram bound

    # mergeable: summing two half-corpus sketches == whole-corpus sketch
    h1 = quantile_sketch(df.limit(2500), "v", lo, hi, bins)
    h2 = quantile_sketch(df.subtract(df.limit(2500)), "v", lo, hi, bins)
    merged = (
        h1.unionByName(h2).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = {r.bucket: r.cnt for r in quantile_sketch(df, "v", lo, hi, bins).collect()}
    assert {r.bucket: r.cnt for r in merged.collect()} == whole


def test_hll_merge_windows_equals_sketch_of_union(spark):
    # THE mergeability claim, exactly: folding daily states (MAX per
    # bucket) must give the identical sketch — and therefore the
    # bit-identical estimate — as sketching the 3 days' raw items
    # together.  No approximation is introduced by merging.
    from datetime import date

    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.sketch import (
        hll_estimate,
        hll_merge_windows,
        hll_sketch,
    )

    rows = []
    for d, day in enumerate([date(2024, 1, 1), date(2024, 1, 2), date(2024, 1, 3)]):
        rows += [(day, f"u{d}_{i}") for i in range(200)]
        rows += [(day, f"shared_{i}") for i in range(100)]  # overlap across days
    df = spark.createDataFrame(rows, ["day_d", "user"])

    sk = hll_sketch(df, "user", ["day_d"])
    merged = hll_merge_windows(sk, "day_d", window_days=3)
    est_merged = {
        r["day_d"]: r["estimate"]
        for r in hll_estimate(merged, ["day_d"]).collect()
    }
    # for Jan 3 the trailing window covers all three days: compare against
    # a direct sketch of the union of raw items
    union_all = df.select(F.lit(1).alias("g"), "user")
    est_union = hll_estimate(hll_sketch(union_all, "user", ["g"]), ["g"]).collect()[0][
        "estimate"
    ]
    assert est_merged[date(2024, 1, 3)] == est_union
    # Jan 1's trailing window is just day 1: merged == daily state
    est_daily = {
        r["day_d"]: r["estimate"] for r in hll_estimate(sk, ["day_d"]).collect()
    }
    assert est_merged[date(2024, 1, 1)] == est_daily[date(2024, 1, 1)]
    # monotone: a window superset never estimates below its largest day
    assert est_merged[date(2024, 1, 3)] >= max(est_daily.values()) * 0.9


def test_hll_overlap_pairs_merge_matches_union_sketch(spark):
    from aicoe_osc_demo_spark.operators.sketch import (
        hll_estimate,
        hll_overlap_pairs,
        hll_sketch,
    )

    # two groups with a known 50-item overlap out of 150/150
    rows = [("A", f"i{i}") for i in range(150)] + [
        ("B", f"i{i}") for i in range(100, 250)
    ]
    df = spark.createDataFrame(rows, ["g", "item"])
    out = hll_overlap_pairs(df, "item", "g").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    # merged-state union estimate must equal the sketch of the raw union
    direct = hll_estimate(
        hll_sketch(df.select("item"), "item")
    ).collect()[0]["estimate"]
    assert r["est_union"] == direct
    # inclusion-exclusion lands near the true 50 within HLL error bands
    assert 20 <= r["est_intersect"] <= 90
    # per-side estimates sit in the HLL error band around the true 150
    assert 120 <= r["est_a"] <= 180 and 120 <= r["est_b"] <= 180
