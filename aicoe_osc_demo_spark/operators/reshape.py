"""Reshape operators (U4-U9 of SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_paragraphs(
    df: DataFrame, pages_col: str = "source_page", paras_col: str = "relevant_paragraphs"
) -> DataFrame:
    """U6 — split_multi_paragraph semantics
    (ref: kpi_inference_curator.py:149-192): a row with N relevant paragraphs
    and either N source pages (zip) or exactly 1 source page (broadcast the
    page to all N) becomes N rows.

    Output replaces the two array columns with scalar (source_page,
    relevant_paragraph).
    """
    pages = F.when(
        F.size(F.col(pages_col)) == 1,
        F.array_repeat(F.element_at(F.col(pages_col), 1), F.size(F.col(paras_col))),
    ).otherwise(F.col(pages_col))
    zipped = F.explode(F.arrays_zip(pages.alias("pg"), F.col(paras_col).alias("pr"))).alias("z")
    others = [c for c in df.columns if c not in (pages_col, paras_col)]
    return df.select(*others, zipped).select(
        *others,
        F.col("z.pg").alias("source_page"),
        F.col("z.pr").alias("relevant_paragraph"),
    )


def nest_to_squad(
    df: DataFrame,
    file_col: str = "source_file",
    context_col: str = "context",
    question_col: str = "question",
    id_col: str = "example_id",
    answer_col: str = "answer",
    starts_col: str = "answer_start",
) -> DataFrame:
    """U8 — nest flat QA rows into SQuAD v2 structure
    (ref: base_kpi_inference_curator.py:60-127): data → title/paragraphs →
    context/qas → question/id/answers/is_impossible.

    Lists are sorted (sort_array of structs keyed by id) so output is
    deterministic under any partitioning — pandas got this for free from file
    order.
    """
    qas = df.groupBy(file_col, context_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col(question_col).alias("question"),
                    F.struct(
                        F.col(answer_col).alias("text"),
                        F.col(starts_col).alias("answer_start"),
                    ).alias("answers"),
                    (F.size(F.col(starts_col)) == 0).alias("is_impossible"),
                )
            )
        ).alias("qas")
    )
    paragraphs = qas.groupBy(file_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(context_col).alias("context"), F.col("qas").alias("qas")))
        ).alias("paragraphs")
    )
    return paragraphs.select(F.col(file_col).alias("title"), "paragraphs")


def gather_table_text(df: DataFrame, cells_col: str = "cells") -> DataFrame:
    """U9 — per-table text gathering (ref: farm_trainer.py:82-93): drop
    numeric-only cells from the flattened cell array, join the rest with
    ', '."""
    flat = F.flatten(F.col(cells_col))
    textual = F.filter(
        flat, lambda c: ~c.rlike("^\\W*[0-9]*\\W?[0-9]*?\\W*$") & (F.length(F.trim(c)) > 0)
    )
    return df.withColumn("table_text", F.array_join(textual, ", "))
