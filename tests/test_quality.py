"""Corpus-quality operators: repetition stats, PII scrub, URL
normalization, quality-weighted resampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aicoe_osc_demo_spark.functions.analysis import (
    pii_counts,
    pii_redact,
    url_host,
    url_normalize,
)
from aicoe_osc_demo_spark.operators.quality import repetition_stats, resample_by_quality


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # 1 distinct word / 4; 2-grams: "a a" x3
            (2, "x y z w"),  # all distinct; 2-grams all distinct
            (3, "p q p q p"),  # 2 distinct / 5; grams: pq,qp,pq,qp -> top 2/4
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].n_words == 4
    assert rows[1].dup_word_frac == 0.75
    assert rows[1].top_ngram_frac == 1.0
    assert rows[1].dup_ngram_frac == pytest.approx(2 / 3)
    assert rows[2].dup_word_frac == 0.0
    assert rows[2].dup_ngram_frac == 0.0
    assert rows[2].top_ngram_frac == pytest.approx(1 / 3)
    assert rows[3].top_ngram_frac == 0.5
    assert rows[3].dup_ngram_frac == 0.5


def test_repetition_single_word_doc(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    # one word -> one degenerate 1-gram "solo"; no division by zero
    assert r.n_words == 1 and r.dup_word_frac == 0.0 and r.top_ngram_frac == 1.0


def test_pii_redact_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or 192.168.0.1 call 555-123-4567 end")],
        "id long, t string",
    )
    out = df.select(pii_redact(F.col("t")), *pii_counts(F.col("t"))).collect()[0]
    assert out.redacted == "mail [EMAIL] or [IP] call [PHONE] end"
    assert (out.n_emails, out.n_ipv4, out.n_phones) == (1, 1, 1)


def test_pii_email_redacted_before_phone(spark):
    # digits inside an address must not survive as a half-matched phone
    df = spark.createDataFrame([(1, "a 555-123-4567@x.co b")], "id long, t string")
    assert df.select(pii_redact(F.col("t"))).collect()[0].redacted == "a [EMAIL] b"


@pytest.mark.parametrize(
    "url,norm",
    [
        ("https://A.com/p?utm_source=x&k=1#f", "https://A.com/p?k=1"),
        ("https://a.com/p?k=1&utm_medium=m", "https://a.com/p?k=1"),
        ("https://a.com/p?utm_campaign=c", "https://a.com/p"),
        ("https://a.com/p?gclid=99&fbclid=7&k=2", "https://a.com/p?k=2"),
        ("https://a.com/p", "https://a.com/p"),
    ],
)
def test_url_normalize(spark, url, norm):
    df = spark.createDataFrame([(url,)], "u string")
    assert df.select(url_normalize(F.col("u"))).collect()[0].url_norm == norm


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.COM/path?q=1",), ("http://sub.host.io/x",)], "u string"
    )
    hosts = [r.host for r in df.select(url_host(F.col("u"))).collect()]
    assert hosts == ["www.example.com", "sub.host.io"]


def test_resample_deterministic_and_rate(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 10 / 10.0).alias("q")
    )
    out = resample_by_quality(df, F.col("q"), n_buckets=5)
    agg = {
        r.bucket: (r.total, r.kept)
        for r in out.groupBy("bucket")
        .agg(F.count("*").alias("total"), F.sum(F.col("kept").cast("int")).alias("kept"))
        .collect()
    }
    assert set(agg) == {0, 1, 2, 3, 4}
    for b, (total, kept) in agg.items():
        rate = (b + 1) / 5
        assert kept / total == pytest.approx(rate, abs=0.06)
    # top bucket keeps everything (threshold ffffffff)
    assert agg[4][0] == agg[4][1]
    # deterministic: identical rerun
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out.collect()))


def test_repetition_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_cap_per_group_deterministic(spark):
    from aicoe_osc_demo_spark.operators.quality import cap_per_group

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(90)], "doc_id long, grp string"
    )
    out = cap_per_group(df, ["grp"], n=10)
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 10, "g1": 10, "g2": 10}
    # deterministic subset across reruns
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in out.collect())
    # small groups pass through whole
    small = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, grp string")
    assert cap_per_group(small, ["grp"], n=10).count() == 2


def test_mixture_sample_flattens_distribution(spark):
    from aicoe_osc_demo_spark.operators.quality import mixture_sample

    rows = [(i, "big") for i in range(3000)] + [(10000 + i, "small") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, "source", alpha=0.5, budget_frac=0.5)
    agg = {
        r.source: (r.rate, r.kept / r.n)
        for r in out.groupBy("source", "rate")
        .agg(F.sum(F.col("kept").cast("int")).alias("kept"), F.count("*").alias("n"))
        .collect()
    }
    # sqrt temperature: rare source keeps a larger fraction than dominant one
    assert agg["small"][0] > agg["big"][0]
    # realized keep fraction tracks the target rate
    for rate, frac in agg.values():
        assert frac == pytest.approx(min(rate, 1.0), abs=0.05)


def test_containment_catches_subset_jaccard_misses(spark):
    from aicoe_osc_demo_spark.operators.dedup import containment_pairs

    long_text = " ".join(f"w{i}" for i in range(60))
    snippet = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, long_text), (2, snippet), (3, "entirely different words here now")],
        "doc_id long, text string",
    )
    rows = containment_pairs(df, threshold=0.9, allow_all_pairs=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.d1, r.d2) == (1, 2)
    # snippet fully contained in the long doc; reverse direction small
    assert r.c_d2_in_d1 == 1.0 and r.c_d1_in_d2 < 0.2


def test_containment_requires_blocking(spark):
    from aicoe_osc_demo_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        containment_pairs(df)


def test_dedup_clusters_transitive_chain(spark):
    from aicoe_osc_demo_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "d1 long, d2 long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_clusters_long_path_pointer_jumping(spark):
    from aicoe_osc_demo_spark.operators.dedup import dedup_clusters

    # a 40-node path converges well inside max_iter only because of the
    # label-jump step (plain neighbor propagation needs 40 rounds)
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], "d1 long, d2 long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs, max_iter=10).collect()}
    assert set(got.values()) == {0} and len(got) == 41


def test_lm_perplexity_scores_hand_computed(spark):
    import math

    from aicoe_osc_demo_spark.operators.quality import lm_perplexity_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "z"), (4, "c c")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.n_bigrams, r.avg_logp) for r in lm_perplexity_scores(docs).collect()}
    # corpus bigrams: doc1: ab, ba, ab; doc2: ab; doc4: cc
    # C(a,b)=4? no: ab appears 3x (doc1 twice, doc2 once); ba once; cc once
    # C(a)=4 (starts: a,a in doc1? starts: a,b,a -> w1 seq a,b,a; doc2 w1=a; doc4 w1=c,? "c c" -> one bigram (c,c))
    # w1 counts: a: doc1 has bigrams (a,b),(b,a),(a,b) -> w1: a,b,a; doc2: a; doc4: c
    # C(a)=3, C(b)=1, C(c)=1 ; V = distinct tokens = {a,b,c,z} = 4
    pab = (3 + 1) / (3 + 4)
    pba = (1 + 1) / (1 + 4)
    pcc = (1 + 1) / (1 + 4)
    assert 3 not in out  # single token -> no bigrams
    assert out[1][0] == 3

    # r11: per-bigram log-probs quantize to integer micro-ln units before
    # the per-doc mean (accumulation-order-proof — FLAKE_AUDIT_r11.md), so
    # the hand model is floor(ln(p)*1e6+0.5) integers, then ONE division
    def lp_u(p):
        return math.floor(math.log(p) * 1e6 + 0.5)

    expected1 = round((2 * lp_u(pab) + lp_u(pba)) / 3 / 1e6, 6)
    assert out[1][1] == expected1
    assert out[2] == (1, round(lp_u(pab) / 1 / 1e6, 6))
    assert out[4] == (1, round(lp_u(pcc) / 1 / 1e6, 6))


def test_lm_perplexity_plan_no_cartesian_beyond_broadcast_vocab(spark):
    from aicoe_osc_demo_spark.operators.quality import lm_perplexity_scores

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = lm_perplexity_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_dsir_resample_prefers_target_like_docs(spark):
    # Raw corpus: 10 docs in the target "style" (shared vocabulary) and 10
    # in a disjoint vocabulary.  DSIR importance weights must rank every
    # target-like doc above every off-domain doc, so top-10 selection
    # recovers exactly the target-like slice (Gumbel noise is bounded
    # ~[-0.7, 5.6] while the vocab separation gives a large logw gap).
    from aicoe_osc_demo_spark.operators.quality import dsir_resample

    style_a = "the model trains on clean english text with careful curation steps"
    style_b = "zzq qqz xqx zxz qzz xzx zqq qxq zzx xxz"
    raw_rows = [(i, style_a + f" variant {i}") for i in range(10)]
    raw_rows += [(100 + i, style_b + f" other {i}") for i in range(10)]
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    target = spark.createDataFrame(
        [(1000 + i, style_a + f" sample {i}") for i in range(5)], ["doc_id", "text"]
    )
    out = dsir_resample(raw, target, buckets=64, k=10)
    rows = out.collect()
    assert len(rows) == 10
    assert {r.doc_id for r in rows} == set(range(10))
    assert all(r.logw > 0 for r in rows)
    # deterministic: identical re-run
    again = dsir_resample(raw, target, buckets=64, k=10).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dsir_target_flag_matches_two_frame_path(spark):
    # target_flag= (single featurization scan, membership carried through
    # the explode) must select bit-identically to passing the same slice
    # as a separate target frame — the r13 scan-sharing optimization.
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.quality import dsir_resample

    rows = [
        (i, ("alpha beta gamma delta " if i % 3 == 0 else "zz qq xx ww ") + f"doc {i}",
         "en" if i % 3 == 0 else "de")
        for i in range(30)
    ]
    raw = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    two_frame = dsir_resample(
        raw, raw.filter(F.col("lang") == "en"), buckets=64, k=8
    ).collect()
    flagged = dsir_resample(
        raw, None, buckets=64, k=8, target_flag=F.col("lang") == "en"
    ).collect()
    assert sorted(map(tuple, two_frame)) == sorted(map(tuple, flagged))


def test_c4_rule_filter_line_and_page_rules(spark):
    from aicoe_osc_demo_spark.operators.quality import c4_rule_filter

    rows = [
        # two good lines + one no-punct line + one short line
        (1, "alpha beta gamma delta epsilon.\nshort line.\n"
            "one two three four five six!\nno terminal punctuation here at all"),
        # page mentioning lorem ipsum -> dropped entirely
        (2, "alpha beta gamma delta epsilon.\nLorem Ipsum dolor sit amet yes."),
        # page with a curly brace -> dropped entirely
        (3, "alpha beta gamma delta epsilon.\nfunction f() { return 1; }"),
        # only one surviving line -> below min_lines
        (4, "alpha beta gamma delta epsilon.\ntoo short."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_rule_filter(df, min_words=5, min_lines=2).collect()}
    assert set(out) == {1}
    assert out[1].n_lines == 2
    assert out[1].clean_text == (
        "alpha beta gamma delta epsilon.\none two three four five six!"
    )


def test_token_budget_plan_shares_and_epochs(spark):
    import math

    from aicoe_osc_demo_spark.operators.quality import token_budget_plan

    rows = [(i, "w " * (100 if i < 8 else 800), "big" if i >= 8 else "small")
            for i in range(10)]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], ["doc_id", "text", "source"]
    )
    out = {r.source: r for r in token_budget_plan(df, budget_tokens=1000).collect()}
    n_small, n_big = 8 * 100, 2 * 800
    z = math.floor(math.sqrt(n_small) * 1e9 + 0.5) + math.floor(math.sqrt(n_big) * 1e9 + 0.5)
    for src, n in (("small", n_small), ("big", n_big)):
        s_ni = math.floor(math.sqrt(n) * 1e9 + 0.5)
        assert out[src].n_tokens == n
        assert out[src].share == round(s_ni / z, 6)
        assert out[src].target_tokens == math.floor(s_ni / z * 1000.0 + 0.5)
    # sqrt temperature flattens: the small source is up-weighted relative
    # to its raw token share
    assert out["small"].share > n_small / (n_small + n_big)
    assert abs(out["small"].share + out["big"].share - 1.0) < 1e-5


def test_expectations_rowlocal_unique_fk(spark):
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.quality import (
        check_expectations,
        fk_violations,
        unique_violations,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (2, -1.0), (3, 12.0)], ["k", "v"]
    )
    rep = {
        r["rule"]: r["n_violations"]
        for r in check_expectations(
            df,
            [
                ("v_nonneg", F.col("v") >= 0),      # NULL -> violation too
                ("v_under_10", F.col("v") < 10),
                ("k_nonnull", F.col("k").isNotNull()),
            ],
        ).collect()
    }
    assert rep == {"v_nonneg": 2, "v_under_10": 2, "k_nonnull": 0}
    # one scan: a single aggregate node evaluates every rule
    plan = check_expectations(df, [("a", F.col("v") >= 0)])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Scan") == 1

    uq = unique_violations(df, ["k"]).collect()[0]
    assert uq["n_violations"] == 1  # k=2 appears twice -> one extra row

    parent = spark.createDataFrame([(1,), (3,)], ["k"])
    fk = fk_violations(df, parent, on=["k"]).collect()[0]
    assert fk["n_violations"] == 2  # both k=2 rows are orphans


def test_triangle_count_known_graph_and_hub_orientation(spark):
    from itertools import combinations

    from aicoe_osc_demo_spark.operators.graph import triangle_count

    # K4 (4 triangles) + a pendant + a disconnected edge; duplicate and
    # reversed input edges must not inflate counts
    k4 = list(combinations([0, 1, 2, 3], 2))
    edges = k4 + [(3, 9), (20, 21)] + [(b, a) for a, b in k4] + k4[:2]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 4
    # K4 wedge census under degree ordering: each oriented out-pair once
    assert row["n_wedges"] >= row["n_triangles"]

    # star graph (hub + 6 leaves): 0 triangles, and the degree-ordered
    # orientation points every edge INTO the hub, so the hub produces no
    # wedges at all — n_wedges counts only leaf-side pairs (0 here)
    star = spark.createDataFrame([(100, i) for i in range(6)], ["src", "dst"])
    srow = triangle_count(star).collect()[0]
    assert srow["n_triangles"] == 0 and srow["n_wedges"] == 0


def test_k_anonymity_report_hand_computed(spark):
    from aicoe_osc_demo_spark.operators.quality import k_anonymity_report

    rows = [("a", 1)] * 6 + [("a", 2)] * 2 + [("b", 1)] * 4 + [("b", 2)]
    df = spark.createDataFrame(rows, ["seg", "nat"])
    r = k_anonymity_report(df, ["seg", "nat"], k=5).collect()[0]
    # classes: (a,1)=6 ok; (a,2)=2, (b,1)=4, (b,2)=1 below k
    assert (r["n_classes"], r["n_below_k"], r["n_rows_at_risk"], r["min_class_size"]) == (
        4, 3, 7, 1,
    )


def test_label_propagation_clamping_majority_and_ties(spark):
    from aicoe_osc_demo_spark.operators.graph import label_propagation

    # two seed islands (0-labeled node 0, 1-labeled nodes 10, 11) and a
    # chain; node 5 hears both islands equally -> tie breaks to label 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 5), (0, 5), (10, 12), (11, 12), (20, 21)],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([(0, 0), (10, 1), (11, 1)], ["node", "label"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, seeds, iters=3).collect()
    }
    assert got[0] == 0 and got[10] == 1 and got[11] == 1  # seeds clamped
    assert got[1] == 0 and got[2] == 0                    # chain from seed 0
    assert got[12] == 1                                   # majority of {1, 1}
    assert got[5] == 0                                    # tie {0, 1} -> smallest
    assert 20 not in got and 21 not in got                # unreachable island absent
    # a seed's neighbor never overwrites the seed even if outvoted
    edges2 = spark.createDataFrame([(0, 10), (0, 11)], ["src", "dst"])
    got2 = {
        r["node"]: r["label"]
        for r in label_propagation(edges2, seeds, iters=2).collect()
    }
    assert got2[0] == 0 and got2[10] == 1 and got2[11] == 1


def test_winsorize_clips_to_exact_group_quantiles(spark):
    from aicoe_osc_demo_spark.operators.quality import winsorize

    # group g: values 1..10 -> p25 = 3.25, p75 = 7.75 (linear interp)
    rows = [("g", float(v)) for v in range(1, 11)] + [("h", 100.0), ("h", 200.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = winsorize(df, "v", ["grp"], lo=0.25, hi=0.75)
    g = {r["v"]: r for r in out.filter(out.grp == "g").collect()}
    assert g[1.0]["v_win"] == 3.25 and g[1.0]["clip_flag"] == -1
    assert g[3.0]["v_win"] == 3.25 and g[3.0]["clip_flag"] == -1
    assert g[5.0]["v_win"] == 5.0 and g[5.0]["clip_flag"] == 0
    assert g[10.0]["v_win"] == 7.75 and g[10.0]["clip_flag"] == 1
    # group h clips within ITS own bounds, not g's
    h = {r["v"]: r for r in out.filter(out.grp == "h").collect()}
    assert h[100.0]["v_win"] == 125.0 and h[100.0]["clip_flag"] == -1


def test_rater_agreement_kappa_hand_computed(spark):
    from pyspark.sql import functions as F
    from aicoe_osc_demo_spark.operators.quality import rater_agreement

    # 10 rows; rater a = [1]*6+[0]*4, rater b agrees on 8 rows:
    # n11=5, n10=1, n01=1, n00=3 -> po=0.8, pa=0.6, pb=0.6,
    # pe=0.36+0.16=0.52, kappa=(0.8-0.52)/0.48=0.583333
    rows = [(1, 1)] * 5 + [(1, 0)] + [(0, 1)] + [(0, 0)] * 3
    df = spark.createDataFrame(rows, ["a", "b"])
    out = rater_agreement(df, {"ra": F.col("a") == 1, "rb": F.col("b") == 1})
    r = out.collect()[0]
    assert (r["rater_a"], r["rater_b"], r["n"]) == ("ra", "rb", 10)
    assert r["po"] == 0.8 and r["pe"] == 0.52 and r["kappa"] == 0.583333
    # perfect agreement with itself -> kappa 1
    same = rater_agreement(df, {"x": F.col("a") == 1, "y": F.col("a") == 1})
    assert same.collect()[0]["kappa"] == 1.0


def test_ngram_novelty_counts_unseen_grams(spark):
    from pyspark.sql import functions as F
    from aicoe_osc_demo_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # trigrams: "a b c", "b c d"
            (2, "a b c x"),      # "a b c" seen, "b c x" novel
            (3, "q r s"),        # "q r s" novel
        ],
        ["doc_id", "text"],
    )
    ref = docs.filter(F.col("doc_id") == 1)
    got = {r["doc_id"]: r for r in ngram_novelty(docs, ref, n=3).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["n_novel"] == 0
    assert got[2]["n_grams"] == 2 and got[2]["n_novel"] == 1
    assert got[2]["novelty_pct"] == 50.0
    assert got[3]["n_grams"] == 1 and got[3]["n_novel"] == 1


def test_weighted_sample_topk_exact_size_weight_dominance_determinism(spark):
    from pyspark.sql import functions as F
    from aicoe_osc_demo_spark.operators.quality import weighted_sample_topk

    # one overwhelming weight (ln gap ~27 nats >> Gumbel noise) must win
    rows = [(i, "g", 1.0) for i in range(1, 30)] + [(99, "g", 1e12)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    out = weighted_sample_topk(df, F.col("w"), k=5, strata_cols=["grp"])
    got = out.orderBy("rank").collect()
    assert len(got) == 5                      # exact size, not Bernoulli
    assert got[0]["doc_id"] == 99 and got[0]["rank"] == 1
    # deterministic: identical subset on re-run
    again = weighted_sample_topk(df, F.col("w"), k=5, strata_cols=["grp"])
    assert [r["doc_id"] for r in again.orderBy("rank").collect()] == [
        r["doc_id"] for r in got
    ]
    # stratified: each stratum fills its own k
    rows2 = rows + [(1000 + i, "h", 1.0) for i in range(3)]
    df2 = spark.createDataFrame(rows2, ["doc_id", "grp", "w"])
    sizes = {
        r["grp"]: r["n"]
        for r in weighted_sample_topk(df2, F.col("w"), k=5, strata_cols=["grp"])
        .groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"g": 5, "h": 3}          # min(k, |stratum|)


def test_cooccurrence_lift_hand_computed(spark):
    from aicoe_osc_demo_spark.operators.relational import cooccurrence_lift

    rows = [
        ("e1", "a"), ("e1", "b"), ("e1", "b"),   # duplicate event collapses
        ("e2", "a"), ("e2", "b"),
        ("e3", "a"),
        ("e4", "b"), ("e4", "c"),
    ]
    df = spark.createDataFrame(rows, ["user", "item"])
    out = {(r["item_a"], r["item_b"]): r for r in cooccurrence_lift(df, "user", "item").collect()}
    # N=4 users; n_a=3, n_b=3, n_c=1; ab together twice, bc once, ac never
    assert set(out) == {("a", "b"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_both"]) == (3, 3, 2)
    assert ab["lift"] == round(2 * 4 / (3 * 3), 6)
    bc = out[("b", "c")]
    assert bc["lift"] == round(1 * 4 / (3 * 1), 6)


def test_kl_divergence_zero_for_self_and_positive_for_skew(spark):
    from aicoe_osc_demo_spark.operators.quality import kl_divergence_by_group

    # a single group IS the corpus -> p == q exactly -> KL exactly 0
    one = spark.createDataFrame(
        [("s1", t) for t in ["x", "y", "z", "x"]], ["src", "token"]
    )
    r = kl_divergence_by_group(one, "src", "token").collect()[0]
    assert r["kl_nats"] == 0.0 and r["n_tokens"] == 4
    # two disjoint-vocabulary groups diverge from the mixture
    two = spark.createDataFrame(
        [("s1", f"a{i % 7}") for i in range(100)]
        + [("s2", f"b{i % 7}") for i in range(100)],
        ["src", "token"],
    )
    got = {r["src"]: r["kl_nats"] for r in kl_divergence_by_group(two, "src", "token").collect()}
    assert got["s1"] > 0.1 and got["s2"] > 0.1


def test_weighted_sample_topk_drops_nonpositive_weights(spark):
    from pyspark.sql import functions as F
    from aicoe_osc_demo_spark.operators.quality import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], ["doc_id", "w"]
    )
    got = weighted_sample_topk(df, F.col("w"), k=10).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 4]


def test_mad_outliers_flags_tail_and_handles_zero_mad(spark):
    from aicoe_osc_demo_spark.operators.quality import mad_outliers

    # group g: values 1..9 plus a wild 100 -> med 5.5, MAD 2.5;
    # rz(100) = 0.6745*94.5/2.5 = 25.5 -> outlier; rz(9) = 0.944 -> not
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 100.0)]
    # group h: majority value identical -> MAD 0 -> no flags, NULL z
    rows += [("h", 7.0)] * 5 + [("h", 50.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {(r["grp"], r["v"]): r for r in mad_outliers(df, "v", ["grp"]).collect()}
    assert out[("g", 100.0)]["is_outlier"] is True
    assert out[("g", 9.0)]["is_outlier"] is False
    assert out[("g", 100.0)]["med"] == 5.5 and out[("g", 100.0)]["mad"] == 2.5
    assert out[("h", 50.0)]["is_outlier"] is False
    assert out[("h", 50.0)]["robust_z"] is None


def test_winsorize_and_mad_approx_switch_matches_exact_at_tolerance(spark):
    # the documented 100 TB swap: approx_percentile with a tight accuracy
    # must reproduce the exact operator's decisions on a moderate-sized
    # group (rank error <= 1/accuracy ~ 0, so bounds coincide here)
    from aicoe_osc_demo_spark.operators.quality import mad_outliers, winsorize

    rows = [("g", float(i)) for i in range(1, 101)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])

    exact = {
        r["v"]: (r["p_lo"], r["p_hi"], r["v_win"], r["clip_flag"])
        for r in winsorize(df, "v", ["grp"], lo=0.1, hi=0.9).collect()
    }
    approx = {
        r["v"]: (r["p_lo"], r["p_hi"], r["v_win"], r["clip_flag"])
        for r in winsorize(
            df, "v", ["grp"], lo=0.1, hi=0.9, approx=True, accuracy=100000
        ).collect()
    }
    assert set(exact) == set(approx)
    for v in exact:
        el, eh, ew, ef = exact[v]
        al, ah, aw, af = approx[v]
        # bounds within one data-step of the exact interpolated quantile
        # (approx_percentile returns an actual data value, not an
        # interpolation, so allow the unit gap of this integer-ish grid)
        assert abs(al - el) <= 1.0 and abs(ah - eh) <= 1.0
        assert abs(aw - ew) <= 1.0
        if abs(v - el) > 1.0 and abs(v - eh) > 1.0:  # off-boundary rows
            assert af == ef

    ex = {
        r["v"]: r["is_outlier"]
        for r in mad_outliers(df, "v", ["grp"]).collect()
    }
    ap = {
        r["v"]: r["is_outlier"]
        for r in mad_outliers(
            df, "v", ["grp"], approx=True, accuracy=100000
        ).collect()
    }
    assert ex == ap  # the 1000.0 spike flags either way; cutoffs tolerate
    assert ex[1000.0] is True
