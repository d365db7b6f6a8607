"""Round-13 additions: the value-hashed companion entries for the two
rows-only catalog queries, and the bound algebra they rely on.

- ``llm_fuzzy_candidates_profile`` oracles the SQL-expressible prefix of
  llm_fuzzy_ratio_join (blocked candidates, integer UB, closed-form LB,
  UB-vs-LB survivor count); here the bound sandwich lb <= exact <= ub is
  property-tested against the vendored indel scorer.
- ``ml_relevance_split_profile`` oracles the deterministic training input
  of ml_relevance_training_metrics (pair concat, label rule, md5 split,
  Tokenizer token accounting); here the md5 split flag and token counts
  are pinned against hand computations.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def test_bound_sandwich_lb_exact_ub(spark):
    """For every pair: _lb_from_token_arrays <= round-exact indel scorer
    <= _ub_from_token_arrays, and lb equals the scorer whenever the
    prefix comparison is the scorer's max (subset pairs score 100)."""
    from aicoe_osc_demo_spark.operators.fuzzy import (
        _lb_from_token_arrays,
        _processed_tokens,
        _ratio_indel,
        _ub_from_token_arrays,
    )

    rng = random.Random(41)
    vocab = ["aa", "b", "ccc", "Dd", "e2", "ff-g", "émis", "h", "2020", "kpi_id"]
    rows = [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))),
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
        for _ in range(300)
    ] + [("", ""), ("...", "x"), ("a a a", "a"), ("aa b", "aa b ccc")]
    df = spark.createDataFrame(rows, ["a", "b"]).select(
        "a",
        "b",
        _lb_from_token_arrays(
            _processed_tokens(F.col("a")), _processed_tokens(F.col("b"))
        ).alias("lb"),
        _ub_from_token_arrays(
            _processed_tokens(F.col("a")), _processed_tokens(F.col("b"))
        ).alias("ub"),
    )
    for r in df.collect():
        exact = _ratio_indel(r["a"], r["b"])
        assert r["lb"] <= exact <= r["ub"], (r["a"], r["b"], r["lb"], exact, r["ub"])
    # subset hallmark: lb must reach 100 exactly like the scorer
    sub = df.filter((F.col("a") == "aa b") & (F.col("b") == "aa b ccc")).first()
    assert sub["lb"] == 100 == sub["ub"]


def test_fuzzy_profile_survivor_count_hand_case(spark):
    """3 candidates for one left key with hand-computable bounds: the
    profile must count exactly the candidates whose ub reaches max_lb."""
    from aicoe_osc_demo_spark.operators.fuzzy import (
        _lb_from_token_arrays,
        _processed_tokens,
        _ub_from_token_arrays,
    )

    left = spark.createDataFrame([(1, "alpha beta", "en")], ["qid", "text", "lang"])
    # NOTE: the length-only UB is ~100 whenever the two diff strings have
    # EQUAL length (third term 2·min(L1,L2)/(L1+L2) → 1), so the non-
    # winning candidates here are deliberately length-asymmetric:
    #   cid 11: L0=5, l1=10, l2=21 → ub = round(100·2/3) = 67
    #   cid 12: L0=0, l1=10, l2=24 → ub = round(100·20/34) = 59
    right = spark.createDataFrame(
        [
            (10, "alpha beta", "en"),                  # identical: lb = ub = 100
            (11, "alpha zzzzzzzzzzzz qq", "en"),       # partial overlap
            (12, "qqqqqqqqqqqqqqqqqqqqqq w", "en"),    # disjoint
        ],
        ["cid", "text", "lang"],
    )
    pairs = (
        left.select("qid", "lang", _processed_tokens(F.col("text")).alias("_ta"))
        .join(right.select("lang", _processed_tokens(F.col("text")).alias("_tb")), on="lang")
        .select(
            "qid",
            _ub_from_token_arrays(F.col("_ta"), F.col("_tb")).alias("ub"),
            _lb_from_token_arrays(F.col("_ta"), F.col("_tb")).alias("lb"),
        )
    )
    rows = pairs.collect()
    max_lb = max(r["lb"] for r in rows)
    assert max_lb == 100
    survivors = [r for r in rows if r["ub"] >= max_lb]
    # only the identical candidate can reach ub=100 here
    assert len(survivors) == 1


def test_split_profile_md5_flag_and_tokens(spark):
    """The split flag is substr(md5('rel'||doc_id),1,4) < 'cccc' and the
    token count is whitespace pieces of the [SEP]-joined pair — both
    hand-computed here for specific rows."""
    from aicoe_osc_demo_spark.functions.hashing import deterministic_split_flag
    from aicoe_osc_demo_spark.training import prepare_pairs

    d = spark.createDataFrame(
        [(7, "no mention here"), (8, "uses spark daily")], ["doc_id", "text"]
    ).select(
        "doc_id",
        F.lit("Does this mention spark?").alias("question"),
        "text",
        F.when(F.col("text").rlike("\\bspark\\b"), 1).otherwise(0).alias("label"),
    )
    pairs = prepare_pairs(d, "question", "text", "label", keep=("doc_id",)).withColumn(
        "is_train", deterministic_split_flag(F.col("doc_id"), 0.8, "rel")
    )
    got = {r["doc_id"]: r for r in pairs.collect()}
    for doc_id in (7, 8):
        expected_flag = hashlib.md5(f"rel{doc_id}".encode()).hexdigest()[:4] < "cccc"
        assert got[doc_id]["is_train"] == expected_flag
    assert got[7]["label"] == 0.0 and got[8]["label"] == 1.0
    assert got[7]["pair_text"] == "Does this mention spark? [SEP] no mention here"
    # token count of the joined pair: 4 question tokens + 3 text tokens
    n = len("Does this mention spark? [SEP] no mention here".split())
    assert n == 8


def test_prepare_pairs_keep_columns(spark):
    from aicoe_osc_demo_spark.training import prepare_pairs

    d = spark.createDataFrame([(1, "q", "t", 1)], ["k", "q", "t", "lbl"])
    out = prepare_pairs(d, "q", "t", "lbl", keep=("k",))
    assert out.columns == ["pair_text", "label", "k"]
    assert prepare_pairs(d, "q", "t", "lbl").columns == ["pair_text", "label"]


def test_partial_ratio_semantics():
    """fuzz.partial_ratio (ref kpi_inference_curator.py:294): verbatim
    containment scores 100; otherwise the best Indel ratio of the shorter
    processed string vs any equal-length window of the longer."""
    from aicoe_osc_demo_spark.operators.fuzzy import partial_ratio

    assert partial_ratio("beta", "alpha beta gamma") == 100.0
    assert partial_ratio("alpha beta gamma", "beta") == 100.0  # order-free
    # best window for "betx" is "beta": LCS 3 of 4 -> 75
    assert partial_ratio("betX", "alpha beta gamma") == 75.0
    assert partial_ratio("...", "anything") == 0.0
    assert partial_ratio("", "x") == 0.0
    assert partial_ratio("The Mat!", "the cat sat on the mat") == 100.0


def test_partial_ratio_matches_naive_window_max():
    """Property: the bit-parallel window scan equals a naive max over all
    windows with a textbook DP LCS."""
    import random

    from aicoe_osc_demo_spark.operators.fuzzy import _full_process, partial_ratio

    def lcs_dp(x, y):
        prev = [0] * (len(y) + 1)
        for xi in x:
            cur = [0]
            for j, yj in enumerate(y, 1):
                cur.append(prev[j - 1] + 1 if xi == yj else max(prev[j], cur[-1]))
            prev = cur
        return prev[-1]

    def naive(a, b):
        a, b = _full_process(a), _full_process(b)
        if not a or not b:
            return 0.0
        s, longer = (a, b) if len(a) <= len(b) else (b, a)
        m = len(s)
        best = max(lcs_dp(s, longer[i : i + m]) for i in range(len(longer) - m + 1))
        return float(round(100.0 * best / m))

    rng = random.Random(57)
    vocab = ["alpha", "beta", "CO2", "a", "bb", "x-y", "scope", "2020", "kpi_id"]
    for _ in range(200):
        a = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
        b = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
        assert partial_ratio(a, b) == naive(a, b), (a, b)


def test_bleu_doc_pairs_hand_case(spark, tmp_path):
    """BLEU-2 on the textbook pair: cand 'the cat sat on the mat' vs ref
    'the cat is on the mat' -> p1=5/6, p2=3/5, BP=1; plus a single-token
    pair exercising the no-bigram guard (NULL p2/log_bleu)."""
    import math

    from aicoe_osc_demo_spark.plans import QUERIES

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat", "en", "s", 22),
            (1, "hello", "en", "s", 5),
            (25, "the cat is on the mat", "en", "s", 21),
            (26, "hello", "en", "s", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["qid"]: r for r in QUERIES["llm_bleu_doc_pairs"](spark, str(tmp_path)).collect()}
    r0 = out[0]
    assert (r0["c_len"], r0["r_len"]) == (6, 6)
    assert (r0["clip1"], r0["tot1"], r0["clip2"], r0["tot2"]) == (5, 6, 3, 5)
    assert r0["p1"] == round(5 / 6, 6) and r0["p2"] == 0.6
    expected_u = math.floor((math.log(5 / 6) + math.log(3 / 5)) / 2.0 * 1e6 + 0.5)
    assert r0["log_bleu_u"] == expected_u
    r1 = out[1]
    assert (r1["clip1"], r1["tot1"], r1["clip2"], r1["tot2"]) == (1, 1, 0, 0)
    assert r1["p1"] == 1.0 and r1["p2"] is None and r1["log_bleu_u"] is None


def test_staged_bounds_match_single_expression(spark):
    """with_token_set_bounds (staged columns, the fast plan) must be
    bit-identical to the single-expression _ub/_lb helpers on an
    adversarial corpus including empty/subset/duplicate-token cases."""
    import random

    from aicoe_osc_demo_spark.operators.fuzzy import (
        _lb_from_token_arrays,
        _processed_tokens,
        _ub_from_token_arrays,
        with_token_set_bounds,
    )

    rng = random.Random(71)
    vocab = ["aa", "b", "ccc", "Dd", "e2", "ff-g", "émis", "h", "2020", "kpi_id"]
    rows = [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))),
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
        for _ in range(300)
    ] + [("", ""), ("...", "x"), ("a a a", "a"), ("aa b", "aa b ccc"), ("aa b", "b aa")]
    base = spark.createDataFrame(rows, ["a", "b"]).select(
        "a",
        "b",
        _processed_tokens(F.col("a")).alias("_ta"),
        _processed_tokens(F.col("b")).alias("_tb"),
    )
    staged = with_token_set_bounds(base, "_ta", "_tb", ub_col="s_ub", lb_col="s_lb")
    both = staged.select(
        "a",
        "b",
        "s_ub",
        "s_lb",
        _ub_from_token_arrays(F.col("_ta"), F.col("_tb")).alias("e_ub"),
        _lb_from_token_arrays(F.col("_ta"), F.col("_tb")).alias("e_lb"),
    )
    for r in both.collect():
        assert (r["s_ub"], r["s_lb"]) == (r["e_ub"], r["e_lb"]), (r["a"], r["b"])
