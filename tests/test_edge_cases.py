"""Edge-case guards: empty inputs, degenerate arrays, k > corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.operators.dedup import exact_dedup, minhash_dedup_pairs
from aicoe_osc_demo_spark.operators.relational import melt, top_k_per_group
from aicoe_osc_demo_spark.operators.reshape import explode_paragraphs, nest_to_squad
from aicoe_osc_demo_spark.operators.similarity import cosine_topk


def test_empty_inputs_yield_empty_outputs(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs).count() == 0
    assert minhash_dedup_pairs(docs).count() == 0
    flat = spark.createDataFrame(
        [], "source_file string, context string, question string, example_id string, "
        "answer string, answer_start array<int>"
    )
    assert nest_to_squad(flat).count() == 0


def test_topk_k_larger_than_group(spark):
    df = spark.createDataFrame([("a", 1, 1.0), ("a", 2, 2.0)], ["g", "id", "s"])
    out = top_k_per_group(df, ["g"], F.col("s"), 10, tiebreak=["id"])
    assert out.count() == 2  # returns everything, no error


def test_cosine_topk_k_larger_than_corpus(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    out = cosine_topk(emb, emb.filter("vec_id = 0"), k=50)
    assert out.count() == 2  # all neighbors except self


def test_explode_paragraphs_empty_and_single(spark):
    df = spark.createDataFrame(
        [("a.pdf", [], []), ("b.pdf", [3], ["only"])],
        "pdf string, source_page array<int>, relevant_paragraphs array<string>",
    )
    out = explode_paragraphs(df).collect()
    # empty arrays vanish; singleton zips 1:1
    assert [(r.pdf, r.source_page, r.relevant_paragraph) for r in out] == [("b.pdf", 3, "only")]


def test_melt_single_value_var(spark):
    df = spark.createDataFrame([(1, 5.0)], ["id", "x"])
    out = melt(df, ["id"], ["x"]).collect()
    assert [(r.variable, r.value) for r in out] == [("x", 5.0)]


def test_single_doc_minhash_no_pairs(spark):
    docs = spark.createDataFrame([(1, "one single document here")], ["doc_id", "text"])
    assert minhash_dedup_pairs(docs).count() == 0


def test_product_quantize_rejects_indivisible_dim(spark):
    import pytest

    from aicoe_osc_demo_spark.operators.similarity import pq_adc_topk, product_quantize

    df = spark.createDataFrame([(0, [0.1] * 10)], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="not divisible"):
        product_quantize(df, m=4, dim=10)
    with pytest.raises(ValueError, match="not divisible"):
        pq_adc_topk(df, df, df, m=3, dim=10)


def test_ks_and_auc_undefined_on_one_class_emit_null(spark):
    # the degenerate-input contract at suite level: a one-class corpus has
    # no second sample to test / no ranking to score — the statistic is
    # NULL, never an ANSI division error (EDGECHECK guard class)
    from aicoe_osc_demo_spark.plans import QUERIES, load

    import aicoe_osc_demo_spark.plans.ml as ml_plans
    import aicoe_osc_demo_spark.plans.quality as q_plans

    one_class = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for mod, name in ((q_plans, "quality_ks_test"), (ml_plans, "ml_auc_rank")):
        orig = getattr(mod, "load", None)
        try:
            mod.load = lambda _s, _d, _t: one_class  # type: ignore[assignment]
            rows = QUERIES[name](spark, "unused").collect()
            assert len(rows) == 1
            r = rows[0].asDict()
            stat = r.get("ks_d", r.get("auc"))
            assert stat is None, (name, r)
        finally:
            mod.load = orig  # type: ignore[assignment]
