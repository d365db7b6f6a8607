"""Model-inference stages (M1-M4 of SURVEY.md §2.9) as mapInPandas stages.

Reference behavior: FARM Inferencer loaded once per process, fed chunked
dicts of (question, paragraph) pairs, GPU batch 16
(ref: /root/reference/src/models/relevance_infer.py:54-60,95-143 and
text_kpi_infer.py:46-68,180-232).  The Spark shape:

- question fan-out = crossJoin(broadcast(questions))  (J3)
- scoring = ``mapInPandas`` with a per-executor model singleton (loaded
  lazily on first batch, cached in the worker process — the FARM
  ``num_processes`` pool and 1000-dict chunking both disappear: Arrow batch
  size is the chunk, executor cores are the pool)
- no-answer aggregation (A2) + top-k ranking (W1) stay relational.

Transformer weights are not available in this container, so the default
scorer is a DETERMINISTIC STUB — a pure arithmetic function of the input
lengths.  It exercises the exact production dataflow (schema, batching,
singleton lifecycle) while making every downstream stage oracle-checkable in
SQL.  Swapping in a real model is replacing ``_StubModel.predict``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from .relational import top_k_per_group

# Per-executor model cache (S12): populated lazily inside the worker, reused
# across Arrow batches — the Spark analogue of the reference's per-process
# FARM Inferencer (relevance_infer.py:54-60).
_MODEL_CACHE: dict[str, object] = {}


class _StubModel:
    """Deterministic stand-in for the FARM classifier/QA model.

    relevance score  = ((31*len(text) + 17*len(question)) % 1000) / 1000
    no-answer score  = ((13*len(text)) % 1000) / 1000
    answer span      = first 8 whitespace tokens of the paragraph
    """

    def predict_relevance(self, question: pd.Series, text: pd.Series) -> pd.Series:
        return ((31 * text.str.len() + 17 * question.str.len()) % 1000) / 1000.0

    def predict_qa(self, question: pd.Series, text: pd.Series) -> pd.DataFrame:
        score = ((31 * text.str.len() + 17 * question.str.len()) % 1000) / 1000.0
        no_ans = ((13 * text.str.len()) % 1000) / 1000.0
        answer = text.str.split(" ").str[:8].str.join(" ")
        return pd.DataFrame({"answer": answer, "score": score, "no_ans_score": no_ans})


def _get_model(name: str = "stub"):
    if name not in _MODEL_CACHE:
        _MODEL_CACHE[name] = _StubModel()  # real impl: load weights from a path
    return _MODEL_CACHE[name]


def stub_relevance_scores(pairs: DataFrame, question_col: str = "question", text_col: str = "text") -> DataFrame:
    """M1 scoring stage: mapInPandas over (question, text) pairs → + score."""
    cols = pairs.columns
    # Build the output schema without mutating pairs.schema (StructType.add
    # mutates in place and DataFrame.schema is cached).
    out_schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in pairs.schema.fields]
        + [StructField("score", DoubleType())]
    )

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model()
        for pdf in batches:
            pdf["score"] = model.predict_relevance(pdf[question_col], pdf[text_col])
            yield pdf[cols + ["score"]]

    return pairs.mapInPandas(score_batches, schema=out_schema)


def stub_qa_answers(pairs: DataFrame, question_col: str = "question", text_col: str = "text") -> DataFrame:
    """M2 scoring stage: mapInPandas → (answer, score, no_ans_score)."""
    cols = pairs.columns
    out_schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in pairs.schema.fields]
        + [
            StructField("answer", StringType()),
            StructField("score", DoubleType()),
            StructField("no_ans_score", DoubleType()),
        ]
    )

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model()
        for pdf in batches:
            preds = model.predict_qa(pdf[question_col], pdf[text_col])
            for c in preds.columns:
                pdf[c] = preds[c]
            yield pdf[cols + ["answer", "score", "no_ans_score"]]

    return pairs.mapInPandas(score_batches, schema=out_schema)


def infer_single_pair(spark, text: str, question: str) -> dict:
    """M3 — single-pair ad-hoc inference (ref: relevance_infer.py:240-246
    run_text / text_kpi_infer.py:70-82 infer_on_dict): the same scoring stage
    applied to a 1-row DataFrame."""
    df = spark.createDataFrame([(question, text)], ["question", "text"])
    row = stub_qa_answers(df).first()
    return {
        "answer": row.answer,
        "score": row.score,
        "no_ans_score": row.no_ans_score,
    }


def infer_from_squad(squad: DataFrame, top_k: int = 4) -> DataFrame:
    """M4 — SQuAD-file inference (ref: text_kpi_infer.py:84-105): flatten the
    nested SQuAD structure back to (context, question, id) rows, run the QA
    stage, rank per question id."""
    flat = (
        squad.select(F.col("title"), F.explode("paragraphs").alias("p"))
        .select("title", F.col("p.context").alias("text"), F.explode("p.qas").alias("qa"))
        .select(
            "title",
            "text",
            F.col("qa.question").alias("question"),
            F.col("qa.id").alias("example_id"),
        )
    )
    answered = stub_qa_answers(flat)
    return top_k_per_group(
        answered, ["example_id"], F.col("score"), top_k, tiebreak=["text"]
    ).select("example_id", "question", "answer", F.round("score", 6).alias("score"))


def relevance_pipeline(
    paragraphs: DataFrame, questions: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """M1 end-to-end (ref: relevance_infer.py:95-143,196-231): cartesian
    fan-out of questions × paragraphs (question side broadcast — it is a
    KPI-dictionary-sized dimension), score, keep positives.

    The paragraph side is repartitioned to the cluster's parallelism before
    the Python scoring stage: a single parquet file otherwise yields one
    partition and the model stage runs on one core — the shuffle of (id,
    text) rows is orders of magnitude cheaper than serializing inference.
    """
    from .relational import ensure_parallelism

    pairs = ensure_parallelism(paragraphs).crossJoin(F.broadcast(questions))
    scored = stub_relevance_scores(pairs)
    return scored.filter(F.col("score") >= threshold)


def qa_pipeline(
    relevant: DataFrame,
    group_cols: list[str],
    top_k: int = 4,
    no_ans_boost: float = -0.015,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """M2 end-to-end (ref: text_kpi_infer.py:180-274): QA-score each
    (question, paragraph), apply the no-answer boost (F19), rank answers per
    (doc-group, question) and keep top-k (W1), plus the per-group
    all-no-answer aggregate (A2)."""
    answered = stub_qa_answers(relevant)
    answered = answered.withColumn(
        "pure_no_ans_score", F.col("no_ans_score") + F.lit(no_ans_boost)
    ).withColumn(
        "final_answer",
        F.when(F.col("pure_no_ans_score") > F.col("score"), F.lit("no_answer")).otherwise(
            F.col("answer")
        ),
    )
    ranked = top_k_per_group(
        answered, group_cols, F.col("score"), top_k, tiebreak=tiebreak or ["final_answer"]
    )
    return ranked
