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
SQL.  The REAL loading path exists too: pass ``model="/path/to/checkpoint"``
to any scoring stage/pipeline and the executor-local ``_get_model`` loads a
HuggingFace checkpoint (tokenizer + task head) through
``load_hf_checkpoint`` — the Spark analogue of FARM's
``Inferencer.load(model_dir)`` (relevance_infer.py:54-60) — caching one
instance per worker process, with the stub only as the named ``"stub"``
spec, mirroring how ``sources/extraction.py`` treats pdfminer.
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


class ModelLoadError(RuntimeError):
    """A checkpoint path was given but no runtime can load it."""


class HFCheckpointModel:
    """Real inference backend: a HuggingFace checkpoint directory loaded
    once per executor process (S12).  Exposes the same predict_relevance /
    predict_qa surface as the stub so every pipeline stage is
    backend-agnostic.

    Mirrors the reference's FARM usage: sequence-classification head for
    relevance (relevance_infer.py:95-143), QA head with a CLS no-answer
    score for span extraction (text_kpi_infer.py:180-232).  Minibatches of
    ``batch_size`` inside each Arrow batch replicate FARM's GPU batch 16.
    """

    def __init__(self, path: str, batch_size: int = 16):
        import torch  # noqa: F401 — required by transformers inference
        from transformers import (
            AutoConfig,
            AutoModelForQuestionAnswering,
            AutoModelForSequenceClassification,
            AutoTokenizer,
        )

        self.tokenizer = AutoTokenizer.from_pretrained(path)
        config = AutoConfig.from_pretrained(path)
        archs = config.architectures or []
        self.is_qa = any("QuestionAnswering" in a for a in archs)
        cls = AutoModelForQuestionAnswering if self.is_qa else AutoModelForSequenceClassification
        self.model = cls.from_pretrained(path)
        self.model.eval()
        self.batch_size = batch_size

    def _minibatches(self, question: pd.Series, text: pd.Series):
        for lo in range(0, len(question), self.batch_size):
            yield question.iloc[lo : lo + self.batch_size], text.iloc[lo : lo + self.batch_size]

    def predict_relevance(self, question: pd.Series, text: pd.Series) -> pd.Series:
        import torch

        out = []
        with torch.no_grad():
            for q, t in self._minibatches(question, text):
                enc = self.tokenizer(
                    list(q), list(t), truncation=True, padding=True, return_tensors="pt"
                )
                logits = self.model(**enc).logits
                # positive-class probability (FARM relevance label order)
                out.extend(torch.softmax(logits, dim=-1)[:, -1].tolist())
        return pd.Series(out, index=question.index)

    def predict_qa(self, question: pd.Series, text: pd.Series) -> pd.DataFrame:
        import torch

        answers, scores, no_ans = [], [], []
        with torch.no_grad():
            for q, t in self._minibatches(question, text):
                enc = self.tokenizer(
                    list(q), list(t), truncation=True, padding=True, return_tensors="pt"
                )
                res = self.model(**enc)
                start, end = res.start_logits, res.end_logits
                for i in range(start.shape[0]):
                    s_idx = int(start[i].argmax())
                    e_idx = int(end[i, s_idx:].argmax()) + s_idx
                    toks = enc["input_ids"][i][s_idx : e_idx + 1]
                    answers.append(self.tokenizer.decode(toks, skip_special_tokens=True))
                    scores.append(float(start[i, s_idx] + end[i, e_idx]))
                    # CLS-position logits = FARM's no-answer score
                    no_ans.append(float(start[i, 0] + end[i, 0]))
        idx = question.index
        return pd.DataFrame(
            {
                "answer": pd.Series(answers, index=idx),
                "score": pd.Series(scores, index=idx),
                "no_ans_score": pd.Series(no_ans, index=idx),
            }
        )


def load_hf_checkpoint(path: str):
    """The real model-loading path (try-import gated like S1's pdfminer):
    resolve a checkpoint directory into a scoring backend.  Raises
    ModelLoadError with the actionable cause when the transformer runtime is
    absent (this container) — callers fall back to ``"stub"`` explicitly,
    never silently."""
    try:
        import transformers  # noqa: F401
    except ImportError as exc:  # pragma: no cover - runtime-dependent
        raise ModelLoadError(
            f"cannot load checkpoint {path!r}: the 'transformers' runtime is "
            "not installed in this environment; install transformers+torch "
            "on the executors or use model='stub'"
        ) from exc
    return HFCheckpointModel(path)


def _get_model(spec: str = "stub"):
    """Executor-local model singleton (S12).  ``spec`` is either the literal
    ``"stub"`` (deterministic arithmetic scorer, oracle-checkable) or a
    checkpoint path loaded through ``load_hf_checkpoint`` — one instance per
    spec per worker process, reused across Arrow batches."""
    if spec not in _MODEL_CACHE:
        _MODEL_CACHE[spec] = _StubModel() if spec == "stub" else load_hf_checkpoint(spec)
    return _MODEL_CACHE[spec]


def stub_relevance_scores(
    pairs: DataFrame,
    question_col: str = "question",
    text_col: str = "text",
    model: str = "stub",
) -> DataFrame:
    """M1 scoring stage: mapInPandas over (question, text) pairs → + score.
    ``model`` is the backend spec resolved executor-side by ``_get_model``
    ("stub" or a checkpoint path)."""
    cols = pairs.columns
    # Build the output schema without mutating pairs.schema (StructType.add
    # mutates in place and DataFrame.schema is cached).
    out_schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in pairs.schema.fields]
        + [StructField("score", DoubleType())]
    )

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = _get_model(model)
        for pdf in batches:
            pdf["score"] = backend.predict_relevance(pdf[question_col], pdf[text_col])
            yield pdf[cols + ["score"]]

    return pairs.mapInPandas(score_batches, schema=out_schema)


def stub_qa_answers(
    pairs: DataFrame,
    question_col: str = "question",
    text_col: str = "text",
    model: str = "stub",
) -> DataFrame:
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
        backend = _get_model(model)
        for pdf in batches:
            preds = backend.predict_qa(pdf[question_col], pdf[text_col])
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
    paragraphs: DataFrame, questions: DataFrame, threshold: float = 0.5, model: str = "stub"
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
    scored = stub_relevance_scores(pairs, model=model)
    return scored.filter(F.col("score") >= threshold)


def qa_pipeline(
    relevant: DataFrame,
    group_cols: list[str],
    top_k: int = 4,
    no_ans_boost: float = -0.015,
    tiebreak: list[str] | None = None,
    model: str = "stub",
) -> DataFrame:
    """M2 end-to-end (ref: text_kpi_infer.py:180-274): QA-score each
    (question, paragraph), apply the no-answer boost (F19), rank answers per
    (doc-group, question) and keep top-k (W1), plus the per-group
    all-no-answer aggregate (A2)."""
    answered = stub_qa_answers(relevant, model=model)
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
