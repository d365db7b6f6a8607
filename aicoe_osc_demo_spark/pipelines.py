"""End-to-end pipeline compositions mirroring the reference DAGs (SURVEY §3).

Each reference pipeline was N notebook pods exchanging state through S3
prefixes; here each is ONE lazy DataFrame DAG — Catalyst plans the whole
thing, stage boundaries replace pod boundaries, and intermediate
materialization becomes optional checkpoints.

- demo1 (§3.2): CSV/parquet → snakify → tables → LEFT JOIN CTAS → aggregate
  (ref: notebooks/demo1[depracated]/demo1-create-tables.ipynb,
  demo1-join-tables.ipynb).
- inference (§3.1): binary docs → extract → crossJoin(questions) → relevance
  scores → QA answers → ranked results table
  (ref: notebooks/demo2/inference.pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.schema import snakify_columns
from .operators.inference import qa_pipeline, relevance_pipeline
from .sources.extraction import run_folder
from .sources.files import write_table


def demo1_pipeline(
    spark: SparkSession,
    emissions_1: DataFrame,
    emissions_2: DataFrame,
    key: str = "isin",
    joined_table: str | None = None,
) -> DataFrame:
    """§3.2 — demo1: snakify both inputs, left-join on the key (the
    reference's SHOW COLUMNS projection surgery disappears — join(on=key)
    emits one key column), optionally CTAS the result."""
    t1 = snakify_columns(emissions_1)
    t2 = snakify_columns(emissions_2)
    joined = t2.join(t1, on=key, how="left")
    if joined_table:
        write_table(joined, joined_table)
    return joined


def inference_pipeline(
    spark: SparkSession,
    pdf_dir: str,
    questions: DataFrame,
    processed: DataFrame | None = None,
    relevance_threshold: float = 0.5,
    top_k: int = 4,
    results_table: str | None = None,
) -> DataFrame:
    """§3.1 — the full PDF→results-table DAG as one lazy plan:
    binaryFile scan → extract (S1) → question fan-out (J3) → relevance stage
    (M1) → QA stage (M2) + no-answer boost (F19) → top-k (W1).  The
    reference ran this as 4 Kubeflow pods over 29.3 h for 144 PDFs on one
    node; here every stage parallelizes per document."""
    paragraphs = run_folder(spark, pdf_dir, processed=processed).withColumnRenamed(
        "paragraph", "text"
    )
    relevant = relevance_pipeline(paragraphs, questions, threshold=relevance_threshold)
    ranked = qa_pipeline(
        relevant.select("pdf_name", "page", "kpi_id", "question", "text"),
        group_cols=["pdf_name", "kpi_id"],
        top_k=top_k,
        tiebreak=["page", "text"],
    )
    results = ranked.select(
        "pdf_name", "kpi_id", "question", "page", "final_answer", F.round("score", 6).alias("score")
    )
    if results_table:
        write_table(results, results_table, fmt="orc")
    return results
